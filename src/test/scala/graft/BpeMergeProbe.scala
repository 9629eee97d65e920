package graft

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Dev measurement main (test scope, run via `Test/runMain
  * graft.BpeMergeProbe [nMerges] [dirs...]`): times q100's BPE
  * trainer at production-like merge counts so SURVEY §7 carries a
  * measured merges/sec and per-round driver-latency floor, not an
  * extrapolation from nMerges=10.
  */
object BpeMergeProbe {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.map(_.toInt).getOrElse(100)
    val dirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = Engine.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val docs = Tables.documents(spark, dir)
      // batched path (production default): rounds counted via the
      // per-round vocab probe (init entry + one per round)
      val probe = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t0 = System.nanoTime()
      val n = TextAnalysis.bpeTrain(docs, nMerges,
        vocabSizeProbe = Some(probe)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = probe.length - 1
      // sequential baseline: one driver round-trip pair per merge
      val t1 = System.nanoTime()
      val nSeq = TextAnalysis.bpeTrain(docs, nMerges, maxBatch = 1).count()
      val secSeq = (System.nanoTime() - t1) / 1e9
      println(f"[bpe-probe] $dir merges=$n total=$sec%.2f s " +
        f"rounds=$rounds roundTripReduction=${nSeq.toDouble / rounds}%.1fx " +
        f"seqTotal=$secSeq%.2f s speedup=${secSeq / sec}%.2fx " +
        f"mergesPerSec=${n / sec}%.2f perRound=${sec / rounds}%.3f s")
    }
    spark.stop()
  }
}
