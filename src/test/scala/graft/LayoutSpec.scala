package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: bit-interleave correctness, and the pruning payoff —
  * per-file bounding boxes over BOTH dimensions must be far tighter
  * than the natural (insertion-order) layout, and a range predicate's
  * candidate file set under min-max stats (the mechanism parquet
  * skipping actually uses) must shrink accordingly.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zvalue2 interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
        (5L, 3L), (65535L, 65535L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zvalue2(col("a"), col("b")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1)))
    rows.foreach { case ((a, b), z) =>
      assert(z === ref(a, b), s"z($a, $b)")
    }
    assert(rows((65535L, 65535L)) === 0xFFFFFFFFL)
  }

  test("quantize16 maps the domain onto [0, 65535] with clamping") {
    import spark.implicits._
    val qs = Seq(-5.0, 0.0, 500.0, 1000.0, 2000.0).toDF("x")
      .select(Layout.quantize16(col("x"), 0.0, 1000.0).as("q"))
      .collect().map(_.getLong(0))
    assert(qs(0) === 0L)      // below lo clamps
    assert(qs(1) === 0L)
    assert(qs(2) === 32767L)  // floor(0.5 * 65535)
    assert(qs(4) === 65535L)  // above hi clamps
  }

  test("z-order layout tightens per-file stats and prunes range scans") {
    import spark.implicits._
    // a 256×256 grid in row-major (natural) order: the natural layout
    // gives each file full-width x ranges, so only y predicates prune
    val n = 256
    val grid = (0 until n * n).map(i => (i / n, i % n))
      .toDF("y", "x")
    val files = 32

    def fileStats(df: org.apache.spark.sql.DataFrame, path: String) = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("xlo"), max("x").as("xhi"),
          min("y").as("ylo"), max("y").as("yhi"))
        .collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    }

    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val natural = fileStats(
      grid.repartitionByRange(files, col("y"), col("x")), s"$base/natural")
    val zed = fileStats(
      Layout.clusterByZ(grid,
        Layout.quantize16(col("x"), 0, n - 1),
        Layout.quantize16(col("y"), 0, n - 1), files),
      s"$base/zorder")

    def meanArea(st: Seq[(Int, Int, Int, Int)]): Double =
      st.map { case (xlo, xhi, ylo, yhi) =>
        (xhi - xlo + 1).toDouble * (yhi - ylo + 1)
      }.sum / st.size
    // natural order: each file spans the full x width (area ≈ n * n/files
    // = 2048); z-order: files cover near-square tiles (area ≈ n²/files =
    // 2048... both cover n²/files on AVERAGE by pigeonhole — the pruning
    // signal is the PER-DIMENSION projection, tested below)
    // per-dimension spans: a predicate on x alone prunes by xlo..xhi
    val xSpanNatural = natural.map(s => s._2 - s._1 + 1).sum.toDouble / natural.size
    val xSpanZ = zed.map(s => s._2 - s._1 + 1).sum.toDouble / zed.size
    assert(xSpanNatural > 0.9 * n, s"natural layout should span x fully, got $xSpanNatural")
    assert(xSpanZ < 0.35 * n, s"z-order x span should be tile-sized, got $xSpanZ")

    // min-max pruning proxy: files whose [xlo, xhi] intersects x < 32
    val candNatural = natural.count(s => s._1 < 32)
    val candZ = zed.count(s => s._1 < 32)
    assert(candNatural.toDouble / natural.size > 0.9,
      s"every natural file is a candidate, got $candNatural/${natural.size}")
    assert(candZ.toDouble / zed.size < 0.5,
      s"z-order should prune most files for x < 32, got $candZ/${zed.size}")
  }
}
