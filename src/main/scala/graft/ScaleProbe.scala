package graft
import graft.ingest.TokenGen
import graft.table.TokenTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft/local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).agg(sum("id")).head()
    val loc = s"/dev/shm/graft/ztbl_$cpus"
    Bench.wipeDir(loc)
    val t = TokenTable.create(spark, loc)
    (0 until 12).foreach { c =>
      t.append(TokenGen.asTokenRows(TokenGen.generate(spark, 500000, idOffset=c*500000L, minLen=32, maxLen=160, numPartitions=32)))
    }
    val bytes = t.filesLocal(t.current).map(_.bytes).sum
    val t1 = System.nanoTime()
    graft.maintain.Cluster.run(t, graft.maintain.Cluster.ZOrder, "probe-z", math.max(8L*1024*1024, bytes/64))
    println(f"zorder_total: ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
