package graft.core

import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.Gen

/** Partitioner fixtures from FIXTURES.md §3 (numPartitions=8, maxVal=1000)
  * plus range properties.
  */
class GeoPartitionersSpec extends AnyFunSuite with PropHelpers {

  test("dim_partition fixtures") {
    assert(GeoPartitioners.dimPartition(Array(0.0, 1.0), 1000, 8) == 0)
    assert(GeoPartitioners.dimPartition(Array(999.0, 1.0), 1000, 8) == 7)
    assert(GeoPartitioners.dimPartition(Array(1000.0, 1.0), 1000, 8) == 7, "clamp")
    assert(GeoPartitioners.dimPartition(Array(125.0, 1.0), 1000, 8) == 1)
  }

  test("grid_partition fixtures incl. D1 modulo divergence") {
    assert(GeoPartitioners.gridPartition(Array(100.0, 100.0), 1000, 8) == 0)
    assert(GeoPartitioners.gridPartition(Array(600.0, 100.0), 1000, 8) == 1)
    assert(GeoPartitioners.gridPartition(Array(100.0, 600.0), 1000, 8) == 2)
    assert(GeoPartitioners.gridPartition(Array(600.0, 600.0), 1000, 8) == 3)
    // D1: dims=4 raw mask 15 -> 15 % 8 = 7 (reference would emit 15)
    assert(GeoPartitioners.gridPartition(Array(600.0, 600.0, 600.0, 600.0), 1000, 8) == 7)
  }

  test("angle_partition fixtures") {
    assert(GeoPartitioners.anglePartition(Array(1.0, 1.0), 8) == 4)
    assert(GeoPartitioners.anglePartition(Array(1.0, 0.0), 8) == 0)
    assert(GeoPartitioners.anglePartition(Array(0.0, 1.0), 8) == 7, "clamp at upper edge")
    assert(GeoPartitioners.anglePartition(Array(5.0), 8) == 0, "1-dim -> partition 0")
  }

  private val ptGen = for {
    d <- Gen.choose(2, 4)
    vs <- Gen.listOfN(d, Gen.choose(0.0, 10000.0))
  } yield vs.toArray

  test("all partitioners land in [0, n)") {
    forAll2(ptGen, Gen.choose(1, 16)) { (p, n) =>
      assert((0 until n).contains(GeoPartitioners.dimPartition(p, 10000, n)))
      assert((0 until n).contains(GeoPartitioners.gridPartition(p, 10000, n)))
      assert((0 until n).contains(GeoPartitioners.anglePartition(p, n)))
    }
  }
}
