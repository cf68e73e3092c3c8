package graft

import graft.operators.Visual

/** P10 pixel-perfect polygonize: ring topology, winding, collinear
  * merging, and the shoelace-equals-pixel-count invariant.
  */
class PolygonizeSpec extends SparkSpec {

  private def stats(px: Set[(Int, Int)]) = Visual.ringStats(Visual.polygonize(px))

  test("single pixel: one 4-vertex ring, area 1, perimeter 4") {
    val rings = Visual.polygonize(Set((0, 0)))
    assert(rings == Seq(Vector((0, 0), (0, 1), (1, 1), (1, 0))))
    assert(stats(Set((0, 0))) == ((1, 4, 1L, 4L)))
  }

  test("collinear run merges to a rectangle") {
    val rings = Visual.polygonize(Set((0, 0), (0, 1), (0, 2)))
    assert(rings.size == 1)
    assert(rings.head.toSet == Set((0, 0), (0, 1), (3, 0), (3, 1)))
    assert(rings.head.size == 4)
    assert(stats(Set((0, 0), (0, 1), (0, 2))) == ((1, 4, 3L, 8L)))
  }

  test("L-shape: one 6-vertex ring") {
    assert(stats(Set((0, 0), (1, 0), (1, 1))) == ((1, 6, 3L, 8L)))
  }

  test("donut: outer ring plus hole ring with opposite winding") {
    val px = (for (r <- 0 to 2; c <- 0 to 2; if (r, c) != ((1, 1))) yield (r, c)).toSet
    val rings = Visual.polygonize(px)
    assert(rings.size == 2)
    // signed shoelace: outer and hole cancel down to the pixel count
    assert(stats(px) == ((2, 8, 8L, 16L)))
    // the two rings wind in opposite directions
    def signedArea(r: Vector[(Int, Int)]) =
      r.zip(r.tail :+ r.head).map { case (a, b) =>
        a._1.toLong * b._2 - b._1.toLong * a._2
      }.sum
    val signs = rings.map(r => signedArea(r).sign)
    assert(signs.toSet == Set(1L, -1L))
  }

  test("diagonal-touching pixels split into two rings (4-connectivity)") {
    val px = Set((0, 0), (1, 1))
    val rings = Visual.polygonize(px)
    assert(rings.size == 2)
    assert(stats(px) == ((2, 8, 2L, 8L)))
  }

  test("two components") {
    assert(stats(Set((0, 0), (0, 3)))._1 == 2)
  }

  test("assemblePolygons: donut hole attaches to its shell, island stays a shell") {
    // 5×5 shell with a 3×3 hole containing a 1×1 island, plus a separate square
    val ring5 = (for (r <- 0 to 4; c <- 0 to 4
                      if r == 0 || r == 4 || c == 0 || c == 4) yield (r, c)).toSet
    val px = ring5 + ((2, 2)) ++ Set((0, 8), (0, 9), (1, 8), (1, 9))
    val rings = Visual.polygonize(px)
    assert(rings.size == 4) // outer shell, hole, island, separate square
    val polys = Visual.assemblePolygons(rings)
    assert(polys.size == 3)
    val withHole = polys.filter(_._2.nonEmpty)
    assert(withHole.size == 1 && withHole.head._2.size == 1)
    // the island (area 1) and separate square (area 4) are hole-free shells
    assert(polys.count(_._2.isEmpty) == 2)
  }

  test("footprintWkt: world-coordinate polygon, CCW shell, CW hole") {
    val sparkS = spark
    import sparkS.implicits._
    // one 4×4 block at x0=100, y0=200, res 10; nodata at (1,1) makes a hole
    val v = Array.tabulate(16)(i => if (i == 5) -9999 else 7)
    val blocks = Seq(
      ("c", "t1", "2020-01-01", "2020-01-16", 100.0, 200.0, 10.0, 10.0,
        4, 4, -9999, v))
      .toDF("cube", "tileId", "p_start", "p_end", "x0", "y0", "resX", "resY",
        "height", "width", "nodata", "value")
    val out = Visual.footprintWkt(blocks).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Int]("n_shells") == 1 && r.getAs[Int]("n_holes") == 1)
    assert(r.getAs[Long]("valid_cells") == 15L)
    val wkt = r.getAs[String]("wkt")
    // shell spans x 100..140, y 160..200 (CCW from the top-left corner);
    // hole is the (1,1) pixel square, clockwise
    assert(wkt == "POLYGON ((100 200, 100 160, 140 160, 140 200, 100 200), " +
      "(110 190, 120 190, 120 180, 110 180, 110 190))", wkt)
  }

  test("footprintWkt: stride coarsens the mask; two items stay separate") {
    val sparkS = spark
    import sparkS.implicits._
    val full = Array.fill(16)(7)
    val blocks = Seq(
      ("c", "t1", "2020-01-01", "2020-01-16", 0.0, 40.0, 10.0, 10.0, 4, 4, -9999, full),
      ("c", "t2", "2020-01-01", "2020-01-16", 0.0, 40.0, 10.0, 10.0, 4, 4, -9999, full))
      .toDF("cube", "tileId", "p_start", "p_end", "x0", "y0", "resX", "resY",
        "height", "width", "nodata", "value")
    val out = Visual.footprintWkt(blocks, stride = 2).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("valid_cells") == 4L) // 4×4 px → 2×2 cells
      assert(r.getAs[String]("wkt") ==
        "POLYGON ((0 40, 0 0, 40 0, 40 40, 0 40))", r.getAs[String]("wkt"))
    }
  }

  test("pseudo-random mask: shoelace area == pixel count, perimeter == exposed edges") {
    val px = (for (r <- 0 until 17; c <- 0 until 13
                   if (r * 31 + c * 17) % 5 < 2) yield (r, c)).toSet
    val (_, verts, area, perim) = stats(px)
    assert(area == px.size.toLong)
    val exposed = px.toSeq.map { case (r, c) =>
      Seq((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1))
        .count(n => !px.contains(n)).toLong
    }.sum
    assert(perim == exposed)
    // corner census: odd 2×2 windows = 1 corner, diagonal windows = 2
    val corners = (for {
      y <- 0 to 17; x <- 0 to 13
      w = Seq((y - 1, x - 1), (y - 1, x), (y, x - 1), (y, x)).map(px.contains)
    } yield {
      val n = w.count(identity)
      if (n == 1 || n == 3) 1
      else if (n == 2 && w(0) == w(3)) 2
      else 0
    }).sum
    assert(verts == corners)
  }
}
