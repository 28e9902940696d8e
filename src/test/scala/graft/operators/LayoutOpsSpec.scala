package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** File-level proof of the z-order layout: after [[LayoutOps.zorderWrite]],
  * every parquet file's (x, y) bounding box is a small tile — the min/max
  * footer stats a reader prunes with — where an ingest-order write leaves
  * every file spanning the whole domain. */
class LayoutOpsSpec extends AnyFunSuite {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_layout_$tag")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  test("zorderWrite yields tight per-file bounding boxes; ingest order does not") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // Full 64×64 grid in ingest (row-major y-scan) order — the natural
    // arrival layout: x varies fastest, so contiguous ingest runs span
    // the whole x axis.
    val rows = for (y <- 0 until 64; x <- 0 until 64) yield (x.toLong, y.toLong)
    val df = rows.toDF("x", "y")

    val zPath = tmpDir("z")
    LayoutOps.zorderWrite(df, col("x"), col("y"), zPath, 16)
    val natPath = tmpDir("nat")
    df.repartitionByRange(16, monotonically_increasing_id())
      .write.mode("overwrite").parquet(natPath)

    def fileSpans(path: String): Array[(Long, Long)] = {
      val fs = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(fs.length > 1, s"expected multiple files at $path")
      fs
    }

    // 4096 points / 16 files = 256 consecutive z-values per file; a
    // contiguous 256-long z-run touches at most two 16×16 quadtree
    // tiles per axis → span ≤ 32 of a 64-wide domain.
    val z = fileSpans(zPath)
    z.foreach { case (sx, sy) =>
      assert(sx <= 32 && sy <= 32, s"z file spans ($sx, $sy) — not a tile")
    }
    // Ingest order: every file's x range is the full domain.
    val nat = fileSpans(natPath)
    assert(nat.forall { case (sx, _) => sx == 63 },
      s"ingest files unexpectedly x-bounded: ${nat.mkString(",")}")

    // Round trip: nothing lost, z column rides along.
    val back = spark.read.parquet(zPath)
    assert(back.count() == 4096)
    assert(back.columns.contains("graft_z"))
  }
}
