package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators._
import graft.sources.DocSynth

/** Physical-plan quality gates: these assertions pin the properties that
  * make the operators scale — filters reaching the parquet scan, custom
  * expressions staying inside whole-stage codegen, small sides being
  * broadcast, aggregates running partial+final. A regression here is a
  * performance bug even when results stay correct. */
class PlanQualitySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ptsPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graftplan").toString + "/pts"
    DocSynth.points(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(p)
    p
  }
  private def stored: DataFrame = spark.read.parquet(ptsPath)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range filter pushes down to the parquet scan") {
    val plan = planOf(PointOps.range(Seq(PointOps.DimRange("z", 100, 200)))(stored))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(z,100.0)"), s"no pushdown in:\n$plan")
  }

  test("crop box bbox pushes down and scan prunes columns") {
    val df = PointOps.cropBox(PointOps.Box3D(100, 100, 0, 400, 400, 1000))(stored)
      .select("doc_id", "x", "y")
    val plan = planOf(df)
    assert(plan.contains("GreaterThanOrEqual(x,100.0)"), "x bound not pushed")
    // column pruning: z is needed for the filter but intensity/gps_time are not
    assert(!plan.contains("intensity"), s"unpruned scan:\n$plan")
  }

  test("polygon crop stays inside whole-stage codegen") {
    val hexWkt = "POLYGON ((800.3 500.7, 650.3 760.7, 350.3 760.7, 200.3 500.7, 350.3 240.7, 650.3 240.7, 800.3 500.7))"
    val df = JoinOps.cropPolygon(hexWkt)(stored)
    val plan = planOf(df)
    // the Filter containing the PIP test must carry a codegen stage id
    // ("*(n) Filter"), i.e. our custom expressions didn't fall back
    val filterLines = plan.linesIterator.filter(_.contains("st_contains_xy")).toSeq
    assert(filterLines.nonEmpty, s"no PIP filter in:\n$plan")
    assert(filterLines.exists(_.trim.startsWith("*")),
      s"PIP filter fell out of codegen:\n${filterLines.mkString("\n")}")
    // and the bbox prefilter reached the scan
    assert(plan.contains("GreaterThanOrEqual(x,200.3)"), "bbox not pushed")
  }

  test("colorization raster join is a broadcast hash join") {
    val raster = spark.range(0, 256L * 256)
      .select((col("id") % 256).as("px"),
        floor(col("id") / 256).cast("long").as("py"),
        (col("id") % 251).cast("double").as("band1"))
    val df = JoinOps.colorize(raster, Array(0, 4, 0, 0, 0, 4),
      Seq(("band1", "red", 1.0)))(stored)
    assert(planOf(df).contains("BroadcastHashJoin"), "raster join not broadcast")
  }

  test("attribute PIP join broadcasts the cover") {
    val feats = Seq(("POLYGON ((100.3 100.7, 600.3 100.7, 600.3 600.7, 100.3 600.7, 100.3 100.7))", 1.0))
    val df = JoinOps.attributeJoin(feats, "attr")(stored.withColumn("attr", lit(0.0)))
    assert(planOf(df).contains("BroadcastHashJoin"), "cover join not broadcast")
  }

  test("voxel grid is a partial+final hash aggregate (map-side combine)") {
    val plan = planOf(AggOps.voxelGrid(8, 8, 4)(stored))
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  test("doc-level bbox pruning preserves polygon-crop results and pushes down") {
    val hexWkt = "POLYGON ((800.3 500.7, 650.3 760.7, 350.3 760.7, 200.3 500.7, 350.3 240.7, 650.3 240.7, 800.3 500.7))"
    val docs = DocSynth.withDocBounds(DocSynth.cachedDocs(spark, "/root/testdata/sf0.001"))
    val p = java.nio.file.Files.createTempDirectory("graftdocb").toString + "/docs"
    docs.write.mode("overwrite").parquet(p)
    val storedDocs = spark.read.parquet(p)
    val viaDocs = JoinOps.cropPolygonDocs(hexWkt)(storedDocs)
      .select("doc_id", "span_idx")
    val direct = JoinOps.cropPolygon(hexWkt)(
      graft.model.Model.explodePoints(storedDocs)).select("doc_id", "span_idx")
    assert(viaDocs.exceptAll(direct).isEmpty && direct.exceptAll(viaDocs).isEmpty)
    // the doc bbox conjunction reaches the parquet scan
    val plan = viaDocs.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(maxx,"), s"doc bbox not pushed:\n$plan")
  }

  test("optimizer rule injects the PIP prefilter into raw SQL predicates") {
    graft.functions.GraftExtensions.registerTemp(spark)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.PipPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PipPrefilterRule
    val hexWkt = "POLYGON ((800.3 500.7, 650.3 760.7, 350.3 760.7, 200.3 500.7, 350.3 240.7, 650.3 240.7, 800.3 500.7))"
    stored.createOrReplaceTempView("pts_sql")
    val df = spark.sql(
      s"SELECT doc_id, span_idx FROM pts_sql WHERE st_contains_xy('$hexWkt', x, y)")
    val plan = df.queryExecution.executedPlan.toString
    // the injected bbox reached the parquet scan even though the user
    // only wrote the exact predicate
    assert(plan.contains("GreaterThanOrEqual(x,200.3)"),
      s"prefilter not injected / pushed:\n$plan")
    // results equal the operator path
    val viaOp = JoinOps.cropPolygon(hexWkt)(stored).select("doc_id", "span_idx")
    assert(df.exceptAll(viaOp).isEmpty && viaOp.exceptAll(df).isEmpty)
  }

  test("stats reads the input exactly once (one scan + unpivot)") {
    val plan = planOf(AggOps.stats(Seq("x", "y", "z", "intensity", "gps_time"))(stored))
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"stats scanned the input $scans times:\n$plan")
  }

  test("ANN list-partitioned storage: a probe query prunes to the probed partitions") {
    // the scale path for ANN: vectors stored partitioned by their IVF
    // list (or LSH bucket) — a query must read ONLY its probed lists
    val dims = 16
    val vecs = spark.range(0, 2000).select(col("id").as("vec_id"),
      lit(0).as("label"),
      transform(sequence(lit(1), lit(dims)),
        d => sin(col("id") * d).cast("float")).as("embedding"))
    val assigned = AnnOps.ivfListAssign(8)(vecs)
    val p = java.nio.file.Files.createTempDirectory("graftivf").toString + "/vecs"
    assigned.write.mode("overwrite").partitionBy("list").parquet(p)
    val stored = spark.read.parquet(p)
    val probe = stored.filter(col("list").isin(1, 3))
    val plan = planOf(probe)
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"no partition pruning on the list key:\n$plan")
    // and the pruning is real: only the probed partitions' rows return
    val want = assigned.filter(col("list").isin(1, 3)).count()
    assert(probe.count() === want && want > 0)
    // the same gate through the ACTUAL stored-layout operator (k-means
    // refined, written partitioned, probed cold)
    val q = Array.tabulate(dims)(d => math.sin(500.0 * (d + 1)))
    val dir2 = java.nio.file.Files.createTempDirectory("graftivf2").toString + "/store"
    val top = AnnOps.ivfStoredTopK(q, k = 5, nLists = 8, nProbe = 2,
      kmeansIters = 1, storageDir = dir2)(vecs)
    val plan2 = planOf(top)
    assert(plan2.contains("PartitionFilters") && plan2.contains("list"),
      s"stored-IVF probe does not prune partitions:\n$plan2")
    assert(top.count() === 5)
  }

  test("IVF k-means refinement is partitioning-invariant (integer-exact means)") {
    val dims = 8
    val vecs = spark.range(0, 500).select(col("id").as("vec_id"),
      lit(0).as("label"),
      transform(sequence(lit(1), lit(dims)),
        d => sin(col("id") * d).cast("float")).as("embedding"))
    val c1 = AnnOps.ivfKMeansCentroids(vecs.repartition(3), nLists = 6, iters = 2)
    val c2 = AnnOps.ivfKMeansCentroids(vecs.repartition(13), nLists = 6, iters = 2)
    c1.zip(c2).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq === b.toSeq, s"centroid $i differs across partitionings")
    }
    // refinement moved the centroids off the seeds
    val seeds = AnnOps.ivfCentroids(vecs, 6)
    assert(c1.zip(seeds).exists { case (a, s) => a.toSeq != s.toSeq })
  }

  test("exact PMF window joins: no cartesian product, map-side-combinable min/max") {
    val p = GroundOps.PmfParams(cellSize = 4, maxWindowSize = 40,
      slope = 1.0, initialDistance = 2.0, maxDistance = 20.0)
    val plan = planOf(GroundOps.pmfExact(p)(stored.limit(500)))
    assert(!plan.contains("CartesianProduct"), s"cartesian in PMF plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"nested-loop join in PMF plan:\n$plan")
  }

  test("exact PMF membership is identical across shuffle partitionings (4 vs 32)") {
    val p = GroundOps.PmfParams(cellSize = 8, maxWindowSize = 20,
      slope = 1.0, initialDistance = 2.0, maxDistance = 20.0)
    def run(parts: Int): Set[(String, Int)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try GroundOps.pmfExact(p, extract = true)(stored.repartition(parts))
        .select("doc_id", "span_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = run(4); val b = run(32)
    assert(a === b, s"PMF ground set differs: ${a.size} vs ${b.size}")
    assert(a.nonEmpty)
  }

  test("morton key and cell id are codegen'd projections") {
    val df = stored.select(
      graft.functions.SpatialFunctions.mortonKey(col("x"), col("y")).as("mk"),
      graft.functions.SpatialFunctions.cellId(col("x"), col("y"), 10).as("cell"))
    val plan = planOf(df)
    val prj = plan.linesIterator.filter(l => l.contains("morton_key")).toSeq
    assert(prj.exists(_.trim.startsWith("*")), s"morton not codegen'd:\n$plan")
  }
}
