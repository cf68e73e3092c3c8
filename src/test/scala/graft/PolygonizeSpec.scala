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
