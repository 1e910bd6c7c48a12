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
    // stage breakdown on a fresh cache
    locally {
      val sh0 = Dedup.shingles(docs, "doc_id", "text", 3)
        .select(col("doc_id"), xxhash64(col("shingle")).as("sh")).cache()
      time("  stage: shingle+hash cache")(sh0.count())
      val drop = sh0.groupBy("sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > 1000).select("sh")
      val forSig = sh0.join(broadcast(drop), Seq("sh"), "left_anti")
      val sigs = forSig.groupBy("doc_id")
        .agg(graft.functions.HashFunctions.minhashSig(col("sh"), 64).as("sig"))
      time("  stage: signatures")(sigs.count())
      val cands = Dedup.lshCandidates(sigs, 16, 4)
      time("  stage: candidates")(cands.count())
      sh0.unpersist()
    }
    time("pipeline guard=0 (first)")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8, maxShingleDocFreq = 0).count())
    time("pipeline guard=1000")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8).count())
    time("pipeline guard=0 (again)")(Dedup.minhashDedup(docs, "doc_id", "text", 0.8, maxShingleDocFreq = 0).count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
    sh.count()
    time("signatures typed-agg splitmix (new)")(Dedup.minhashSignatures(sh).count())
    val oldMins = (0 until 64).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    time("signatures 64x xxhash64 (old)")(
      sh.groupBy("doc_id").agg(oldMins.head, oldMins.tail: _*).count())
    spark.stop()
  }
}
