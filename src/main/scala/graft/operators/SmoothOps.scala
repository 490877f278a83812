package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.CellSpace

/** filters.smooth — Moving-Least-Squares surface smoothing (the
  * reference's PCL smooth kernel: plugins/pcl/kernel/SmoothKernel.cpp,
  * which runs pcl::MovingLeastSquares with setSearchRadius(1),
  * setPolynomialFit(true), setPolynomialOrder(2) —
  * plugins/pcl/pipeline/PCLPipeline.hpp:552-575).
  *
  * Semantics per the published MLS algorithm (Alexa et al. 2003, as in
  * PCL's computeMLSPointNormal):
  *  1. neighbors within `radius` of each point (grid-partitioned radius
  *     self-join — same exact 3x3-ring machinery as SOR/ROR, cell side
  *     required >= radius);
  *  2. local plane: centroid + covariance of the neighborhood, normal =
  *     eigenvector of the smallest eigenvalue (closed-form symmetric
  *     3x3 eigensolver); the point projects onto the plane;
  *  3. order-2 correction: weighted least squares of neighbor heights
  *     over the local (u,v) frame with Gaussian weights
  *     exp(-d^2/radius^2), basis {1,u,v,u^2,uv,v^2}; the smoothed point
  *     is the plane projection shifted along the normal by the fit's
  *     constant term (the polynomial evaluated at the projection).
  *
  * Neighborhoods with <3 points (plane undefined) pass through
  * unchanged; <6 points or a singular normal system fall back to the
  * plane projection (PCL falls back the same way when nr_coeff >
  * neighbors).
  *
  * Scale shape: one cell-ring shuffle to build pairs, one hash aggregate
  * collecting each point's bounded neighborhood (radius-bounded, like
  * PCL's), one map to solve the 3x3 eigen + 6x6 LS per point. The
  * per-point solve is a scalar UDF by design — a cold O(n) tail after
  * the joins, not a pushdown-bearing hot predicate (the same split the
  * UDF-surface operators use). */
object SmoothOps {

  /** Unit eigenvector of the smallest eigenvalue of the symmetric 3x3
    * matrix [[a,b,c],[b,d,e],[c,e,f]] (trigonometric closed form +
    * cross-product eigenvector extraction). */
  private[graft] def smallestEigvec(
      a: Double, b: Double, c: Double,
      d: Double, e: Double, f: Double): Array[Double] = {
    val p1 = b * b + c * c + e * e
    if (p1 <= 1e-300) {
      // already diagonal — unit axis of the smallest diagonal entry
      if (a <= d && a <= f) return Array(1.0, 0.0, 0.0)
      if (d <= a && d <= f) return Array(0.0, 1.0, 0.0)
      return Array(0.0, 0.0, 1.0)
    }
    val q = (a + d + f) / 3.0
    val p2 = (a - q) * (a - q) + (d - q) * (d - q) + (f - q) * (f - q) + 2.0 * p1
    val p = math.sqrt(p2 / 6.0)
    // B = (A - qI)/p; r = det(B)/2
    val b00 = (a - q) / p; val b11 = (d - q) / p; val b22 = (f - q) / p
    val b01 = b / p; val b02 = c / p; val b12 = e / p
    val detB = b00 * (b11 * b22 - b12 * b12) -
      b01 * (b01 * b22 - b12 * b02) + b02 * (b01 * b12 - b11 * b02)
    val r = math.max(-1.0, math.min(1.0, detB / 2.0))
    val phi = math.acos(r) / 3.0
    val eigSmall = q + 2.0 * p * math.cos(phi + 2.0 * math.Pi / 3.0)
    // rows of (A - eigSmall I); eigenvector = largest cross product
    val r0 = Array(a - eigSmall, b, c)
    val r1 = Array(b, d - eigSmall, e)
    val r2 = Array(c, e, f - eigSmall)
    def cross(u: Array[Double], v: Array[Double]) = Array(
      u(1) * v(2) - u(2) * v(1), u(2) * v(0) - u(0) * v(2), u(0) * v(1) - u(1) * v(0))
    val cands = Seq(cross(r0, r1), cross(r0, r2), cross(r1, r2))
    def norm2(v: Array[Double]) = v(0) * v(0) + v(1) * v(1) + v(2) * v(2)
    val best = cands.maxBy(norm2)
    val n2 = norm2(best)
    if (n2 <= 1e-300) Array(0.0, 0.0, 1.0)
    else { val n = math.sqrt(n2); Array(best(0) / n, best(1) / n, best(2) / n) }
  }

  /** One MLS projection: query point (x,y,z), flat neighbor coords
    * [x0,y0,z0, x1,y1,z1, ...] (self included), search radius, order. */
  private[graft] def project(x: Double, y: Double, z: Double,
      nb: Array[Double], radius: Double, order: Int): Array[Double] = {
    val n = nb.length / 3
    if (n < 3) return Array(x, y, z)
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    var i = 0
    while (i < n) { cx += nb(3 * i); cy += nb(3 * i + 1); cz += nb(3 * i + 2); i += 1 }
    cx /= n; cy /= n; cz /= n
    var sxx = 0.0; var sxy = 0.0; var sxz = 0.0
    var syy = 0.0; var syz = 0.0; var szz = 0.0
    i = 0
    while (i < n) {
      val dx = nb(3 * i) - cx; val dy = nb(3 * i + 1) - cy; val dz = nb(3 * i + 2) - cz
      sxx += dx * dx; sxy += dx * dy; sxz += dx * dz
      syy += dy * dy; syz += dy * dz; szz += dz * dz
      i += 1
    }
    val nrm = smallestEigvec(sxx / n, sxy / n, sxz / n, syy / n, syz / n, szz / n)
    // plane projection of the query point
    val dist = (x - cx) * nrm(0) + (y - cy) * nrm(1) + (z - cz) * nrm(2)
    val px = x - dist * nrm(0); val py = y - dist * nrm(1); val pz = z - dist * nrm(2)
    if (order < 2 || n < 6) return Array(px, py, pz)
    // local orthonormal frame (u,v) in the plane
    val ex = if (math.abs(nrm(0)) < 0.9) Array(1.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0)
    val ux0 = ex(1) * nrm(2) - ex(2) * nrm(1)
    val uy0 = ex(2) * nrm(0) - ex(0) * nrm(2)
    val uz0 = ex(0) * nrm(1) - ex(1) * nrm(0)
    val ul = math.sqrt(ux0 * ux0 + uy0 * uy0 + uz0 * uz0)
    val ux = ux0 / ul; val uy = uy0 / ul; val uz = uz0 / ul
    val vx = nrm(1) * uz - nrm(2) * uy
    val vy = nrm(2) * ux - nrm(0) * uz
    val vz = nrm(0) * uy - nrm(1) * ux
    // weighted order-2 LS: basis {1,u,v,u^2,uv,v^2}, weights
    // exp(-d^2/r^2) on the distance to the projected query point
    val A = Array.ofDim[Double](6, 6)
    val rhs = new Array[Double](6)
    val r2 = radius * radius
    i = 0
    while (i < n) {
      val dx = nb(3 * i) - px; val dy = nb(3 * i + 1) - py; val dz = nb(3 * i + 2) - pz
      val u = dx * ux + dy * uy + dz * uz
      val v = dx * vx + dy * vy + dz * vz
      val h = dx * nrm(0) + dy * nrm(1) + dz * nrm(2)
      val w = math.exp(-(dx * dx + dy * dy + dz * dz) / r2)
      val bvec = Array(1.0, u, v, u * u, u * v, v * v)
      var j = 0
      while (j < 6) {
        var k = 0
        while (k < 6) { A(j)(k) += w * bvec(j) * bvec(k); k += 1 }
        rhs(j) += w * bvec(j) * h
        j += 1
      }
      i += 1
    }
    // Gaussian elimination with partial pivoting; singular => plane fallback
    var row = 0
    while (row < 6) {
      var piv = row
      var best = math.abs(A(row)(row))
      var rr = row + 1
      while (rr < 6) {
        if (math.abs(A(rr)(row)) > best) { best = math.abs(A(rr)(row)); piv = rr }
        rr += 1
      }
      if (best < 1e-12) return Array(px, py, pz)
      if (piv != row) {
        val t = A(piv); A(piv) = A(row); A(row) = t
        val tb = rhs(piv); rhs(piv) = rhs(row); rhs(row) = tb
      }
      rr = row + 1
      while (rr < 6) {
        val fct = A(rr)(row) / A(row)(row)
        var k = row
        while (k < 6) { A(rr)(k) -= fct * A(row)(k); k += 1 }
        rhs(rr) -= fct * rhs(row)
        rr += 1
      }
      row += 1
    }
    val coef = new Array[Double](6)
    row = 5
    while (row >= 0) {
      var s = rhs(row)
      var k = row + 1
      while (k < 6) { s -= A(row)(k) * coef(k); k += 1 }
      coef(row) = s / A(row)(row)
      row -= 1
    }
    val c0 = coef(0) // polynomial at (u,v) = (0,0)
    Array(px + c0 * nrm(0), py + c0 * nrm(1), pz + c0 * nrm(2))
  }

  /** MLS-smooth x/y/z; all other columns pass through untouched. */
  def mlsSmooth(radius: Double, level: Int, polyOrder: Int = 2,
                space: CellSpace = CellSpace.default)(df: DataFrame): DataFrame = {
    val side = math.min(space.maxx - space.minx, space.maxy - space.miny) /
      (1L << level).toDouble
    require(side >= radius,
      s"cell side $side at level $level < radius $radius — use a coarser level")
    val slim = df.select("doc_id", "span_idx", "x", "y", "z")
      .localCheckpoint(eager = true)
    // self INCLUDED in the neighborhood (PCL's radius search returns the
    // query point; the centroid/covariance see it too)
    val pairs = JoinOps.knnPairs(slim, slim, level, space, dims3 = true)
      .filter(col("__d2") <= radius * radius)
    val nbrs = pairs.groupBy(col("doc_id"), col("span_idx"), col("x"), col("y"), col("z"))
      .agg(flatten(collect_list(array(col("__r.x"), col("__r.y"), col("__r.z"))))
        .as("__nb"))
    val proj = udf((x: Double, y: Double, z: Double, nb: Seq[Double]) =>
      project(x, y, z, nb.toArray, radius, polyOrder))
    val smoothed = nbrs.withColumn("__p",
        proj(col("x"), col("y"), col("z"), col("__nb")))
      .select(col("doc_id"), col("span_idx"),
        element_at(col("__p"), 1).as("__sx"),
        element_at(col("__p"), 2).as("__sy"),
        element_at(col("__p"), 3).as("__sz"))
    df.join(smoothed, Seq("doc_id", "span_idx"), "left")
      .withColumn("x", coalesce(col("__sx"), col("x")))
      .withColumn("y", coalesce(col("__sy"), col("y")))
      .withColumn("z", coalesce(col("__sz"), col("z")))
      .drop("__sx", "__sy", "__sz")
  }
}
