package graft.ops

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime shuffle-byte guard for the round-6 substring-dedup keying
  * change (VERDICT r5 #7): hashing windows to 64 bits before the
  * document-frequency aggregate and join must cut total shuffle bytes
  * to well under the raw-string path's — asserted on real task metrics,
  * not plan text, so a regression to string keys (or an accidental
  * extra exchange) fails CI.
  */
class ShuffleBytesSpec extends SparkSpec {

  // One long-lived listener; measurements snapshot the running total
  // (add/remove around a query races the async listener bus).
  private val total = new java.util.concurrent.atomic.AtomicLong()
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      total.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  })

  private def shuffleBytes(f: => Unit): Long = {
    val before = total.get()
    f
    // Listener events drain asynchronously; poll until stable.
    var last = -1L
    var now = total.get()
    var spins = 0
    while (now != last && spins < 50) {
      Thread.sleep(100); last = now; now = total.get(); spins += 1
    }
    now - before
  }

  test("substring dedup shuffles a fraction of the raw-string path's bytes") {
    val docs = Dedup.augmented(spark, "/root/testdata/sf0.001")
    // Force the AT-SCALE join shape: at corpus scale the window
    // document-frequency side is far past any broadcast threshold, so
    // the exploded window set crosses the join exchange. With the
    // fixture's tiny df side Spark would broadcast and neither path
    // would shuffle window data at all (measured: identical bytes).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    // noop sink, NOT count(): count() lets the optimizer eliminate the
    // duplicates-safe left join and both window exchanges outright
    // (guide §1.4) — measured: identical 6KB shuffles for both paths.
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val hashed = shuffleBytes {
      force(Dedup.substringDedup(docs))
    }
    // The round-5 shape, reconstructed: identical query keyed on the
    // raw 8-word window string.
    def stringPath(): DataFrame = {
      val dg = docs
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(array_distinct(
            graft.functions.TextGrams.sliding(col("ws"), Dedup.SubstringWindow))).as("g"))
      val dfreq = dg.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      dg.join(dfreq, Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("shared_windows"))
    }
    val raw = shuffleBytes { force(stringPath()
      .select(col("doc_id"), col("n_windows"), col("shared_windows"),
        expr("shared_windows * 1000L div n_windows").as("shared_pm"))) }
    assert(hashed > 0 && raw > 0, s"hashed=$hashed raw=$raw")
    assert(hashed * 2 < raw,
      s"hashed-window shuffle ($hashed B) should be under half the " +
        s"string-window shuffle ($raw B)")
    // Results identical (collision-free at this scale by construction).
    val a = Dedup.substringDedup(docs).orderBy("doc_id").collect().toSeq
    val b = stringPath()
      .select(col("doc_id"), col("n_windows"), col("shared_windows"),
        expr("shared_windows * 1000L div n_windows").as("shared_pm"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
