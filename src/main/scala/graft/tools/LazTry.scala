// scratch driver: decode a .laz and diff against its .las ground truth
// field-by-field, reporting the FIRST divergence per field (run via
// `sbt "runMain graft.tools.LazTry <laz> <las>"`), or compress a .las
// with the clean-room encoder (`LazTry compress <las> <out.laz>`) for
// external laszip cross-validation (recipe in SCALE.md). Not part of
// the build contract — kept for debugging the LASzip codec.
package graft.tools

import graft.sources.{LasDecode, LasWriter}

object LazTry {
  def main(args: Array[String]): Unit = {
    if (args.length == 3 && args(0) == "compress") {
      val src = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))
      val laz = LasWriter.lasToLaz(src)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)), laz)
      println(s"${args(1)} (${src.length} B) -> ${args(2)} (${laz.length} B)")
      return
    }
    val lazPath = args(0)
    val lasPath = args(1)
    val (h1, laz) = LasDecode.readPoints(lazPath)
    val (h0, las) = LasDecode.readPoints(lasPath)
    println(s"laz: ${laz.size} rows, las: ${las.size} rows, fmt ${h1.pointFormat}/${h0.pointFormat}")
    val fields = LasDecode.schema.fieldNames
    var badRows = 0
    val firstBad = scala.collection.mutable.Map.empty[String, Int]
    laz.zip(las).zipWithIndex.foreach { case ((a, b), i) =>
      var rowBad = false
      fields.indices.foreach { f =>
        if (a.get(f) != b.get(f)) {
          rowBad = true
          if (!firstBad.contains(fields(f))) {
            firstBad(fields(f)) = i
            println(s"  field ${fields(f)} first differs at row $i: laz=${a.get(f)} las=${b.get(f)}")
          }
        }
      }
      if (rowBad) badRows += 1
    }
    println(s"bad rows: $badRows / ${laz.size}")
  }
}
