package graft
import org.apache.spark.sql.functions._
object DbgKCore {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 10000000L
    val edges = spark.range(0, n, 1, 128)
      .select(col("id").as("src"),
        explode(sequence(lit(0L), pmod(xxhash64(col("id")), lit(5L)))).as("j"))
      .select(col("src"), pmod(xxhash64(col("src"), col("j"), lit(7L)), lit(n)).as("dst"))
      .select(col("src"), when(col("dst") === col("src"), pmod(col("src") + 1L, lit(n))).otherwise(col("dst")).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("edges = " + edges.count())
    val k = 4
    def tsec(t0: Long) = f"${(System.nanoTime()-t0)/1e9}%.2f"
    val tAll = System.nanoTime()
    val ue = edges.select(least(col("src"),col("dst")).as("a"), greatest(col("src"),col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val adj = graft.core.Caches.persistTracked(
      ue.select(col("a").as("v"), col("b").as("u"))
        .unionAll(ue.select(col("b").as("v"), col("a").as("a2")).withColumnRenamed("a2","u")))
    var t0 = System.nanoTime()
    var alive = adj.groupBy("v").agg(count(lit(1)).as("deg")).localCheckpoint()
    println(s"deg0: ${tsec(t0)}s")
    var aliveRdd = graft.core.Caches.checkpointRdd(alive)
    var t = 0; var converged = false
    while (t < 12 && !converged) {
      t0 = System.nanoTime()
      val dropped = alive.filter(col("deg") < k).select(col("v").as("u"))
      val nDropped = dropped.count()
      val tCount = tsec(t0)
      if (nDropped == 0) { converged = true; println(s"round $t: count=$tCount s, converged") }
      else {
        t0 = System.nanoTime()
        val probe = if (nDropped <= 4000000L) broadcast(dropped) else dropped
        val delta = adj.join(probe, "u").groupBy("v").agg(count(lit(1)).as("dec"))
        val next = alive.filter(col("deg") >= k)
          .join(delta, Seq("v"), "left")
          .select(col("v"), (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
          .localCheckpoint()
        aliveRdd.foreach(_.unpersist(blocking = false))
        alive = next
        aliveRdd = graft.core.Caches.checkpointRdd(alive)
        println(s"round $t: nDropped=$nDropped countJob=$tCount s, step=${tsec(t0)}s")
        t += 1
      }
    }
    println(s"TOTAL ${tsec(tAll)}s, survivors=" + alive.filter(col("deg") >= 1).count())
    spark.stop()
  }
}
