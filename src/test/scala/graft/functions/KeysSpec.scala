package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the curve key math (SURVEY.md §5.2 item 4).
  * Randomized cases use a fixed seed — deterministic across runs.
  */
class KeysSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def r20(): Long = rnd.nextLong() & ((1L << 20) - 1)

  test("zInterleave is a bijection on a small 2D grid") {
    val seen = scala.collection.mutable.Set.empty[Long]
    for (a <- 0L until 32L; b <- 0L until 32L) {
      val z = Keys.zInterleave(Array(a, b), 5)
      assert(seen.add(z), s"collision at ($a,$b)")
      assert(z >= 0 && z < 1024)
    }
  }

  test("zInterleave2/3 overloads agree with the array form") {
    for (_ <- 1 to 500) {
      val (a, b, c) = (r20(), r20(), r20())
      assert(Keys.zInterleave2(a, b, 20) == Keys.zInterleave(Array(a, b), 20))
      assert(Keys.zInterleave3(a, b, c, 20) == Keys.zInterleave(Array(a, b, c), 20))
    }
  }

  test("zInterleave is monotonic in each dim when others are zero") {
    for (_ <- 1 to 500) {
      val a = r20() & ((1L << 20) - 2)
      assert(Keys.zInterleave(Array(a, 0L), 20) <
        Keys.zInterleave(Array(a + 1, 0L), 20))
    }
  }

  test("hilbertIndex is a bijection on 2D and 3D grids") {
    val seen2 = scala.collection.mutable.Set.empty[Long]
    for (a <- 0L until 16L; b <- 0L until 16L)
      assert(seen2.add(Keys.hilbertIndex(Array(a, b), 4)))
    assert(seen2.min == 0L && seen2.max == 255L)
    val seen3 = scala.collection.mutable.Set.empty[Long]
    for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L)
      assert(seen3.add(Keys.hilbertIndex(Array(a, b, c), 3)))
    assert(seen3.min == 0L && seen3.max == 511L)
  }

  test("hilbert round-trips through hilbertCoords (bijectivity proof)") {
    for (_ <- 1 to 1000) {
      val idx = rnd.nextLong() & ((1L << 12) - 1)
      val coords = Keys.hilbertCoords(idx, 3, 4)
      assert(Keys.hilbertIndex(coords, 4) == idx, s"at index $idx")
    }
  }

  test("hilbert adjacency: consecutive indices are grid neighbors") {
    // The defining locality property Z-order lacks.
    var i = 0L
    while (i < 511L) {
      val a = Keys.hilbertCoords(i, 3, 3)
      val b = Keys.hilbertCoords(i + 1, 3, 3)
      val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(dist == 1, s"index $i -> ${i + 1} moved $dist")
      i += 1
    }
  }

  test("clampBits bounds values into the bit range") {
    assert(Keys.clampBits(-5, 8) == 0)
    assert(Keys.clampBits(300, 8) == 255)
    assert(Keys.clampBits(37, 8) == 37)
  }
}
