package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

object TimeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("time-minhash", "32")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables(spark, sf, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    // warm the parquet/read path
    docs.count()
    time("pipeline guard=0 (first)")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8, maxShingleDocFreq = 0).count())
    time("pipeline guard=1000")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8).count())
    time("pipeline guard=0 (again)")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8, maxShingleDocFreq = 0).count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
    sh.count()
    time("signatures affine (new)")(Dedup.minhashSignatures(sh).count())
    val oldMins = (0 until 64).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    time("signatures 64x xxhash64 (old)")(
      sh.groupBy("doc_id").agg(oldMins.head, oldMins.tail: _*).count())
    spark.stop()
  }
}
