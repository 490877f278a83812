// scratch driver for external PCD cross-validation (recipe in
// tools/external_validate.sh): `convert <in.pcd> <out.pcd> <mode>`
// re-encodes a PCD through the clean-room codec (mode = ascii |
// binary | binary_compressed), `diff <a.pcd> <b.pcd>` decodes both
// and reports the first divergence per field. Not part of the build
// contract — kept for falsifying the self-pinned PCD codec against a
// real PCL/PDAL installation.
package graft.tools

import graft.sources.Pcd

object PcdTry {
  def main(args: Array[String]): Unit = args(0) match {
    case "convert" =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))
      val (schema, rows) = Pcd.decode(bytes, args(1))
      // decode prepends (doc_id, span_idx) bookkeeping — drop both
      val cols = schema.fields.toSeq.drop(2).map(f => (f.name, f.dataType))
      val recs = rows.map(r => Array.tabulate(cols.length)(i => r.get(i + 2))).toIndexedSeq
      val out = Pcd.imageBytes(cols, recs, args(3), shiftOrigin = false)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)), out)
      println(s"${args(1)} (${bytes.length} B) -> ${args(2)} (${out.length} B, ${args(3)})")

    case "diff" =>
      val (s1, a) = Pcd.decode(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1))), args(1))
      val (s2, b) = Pcd.decode(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(2))), args(2))
      println(s"a: ${a.size} rows ${s1.fieldNames.mkString(",")}; " +
        s"b: ${b.size} rows ${s2.fieldNames.mkString(",")}")
      require(s1.fieldNames.sameElements(s2.fieldNames), "schema mismatch")
      var badRows = 0
      val firstBad = scala.collection.mutable.Set.empty[String]
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        var rowBad = false
        // field 0 is the doc_id (the file path) — skip it
        (1 until s1.fieldNames.length).foreach { f =>
          if (ra.get(f) != rb.get(f)) {
            rowBad = true
            if (firstBad.add(s1.fieldNames(f)))
              println(s"  field ${s1.fieldNames(f)} first differs at row $i: " +
                s"a=${ra.get(f)} b=${rb.get(f)}")
          }
        }
        if (rowBad) badRows += 1
      }
      println(s"bad rows: $badRows / ${a.size}")
      if (badRows > 0 || a.size != b.size) sys.exit(1)

    case other => sys.error(s"unknown mode $other (convert|diff)")
  }
}
