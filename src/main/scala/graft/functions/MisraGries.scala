package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra-Gries frequent-items summary (the "frequent"
  * algorithm of Misra & Gries 1982; mergeability per Agarwal et al.
  * 2013, "Mergeable summaries").
  *
  * The buffer holds at most `capacity` counters. Stream update: an
  * arriving item increments its counter, opens a new one if a slot is
  * free, else decrements ALL counters by 1 (dropping zeros) — the
  * classic generalization of Boyer-Moore majority. Merge: add the two
  * counter maps, then subtract the (capacity+1)-largest count from
  * everything and drop non-positives — the error stays additive, so
  * partial aggregation in ANY tree shape preserves the guarantee:
  *
  *   true_count - n / (capacity + 1)  <=  estimate  <=  true_count
  *
  * hence every item with true frequency > n/(capacity+1) survives in
  * the summary no matter how Spark partitions the data. The retained
  * COUNTER VALUES do depend on merge order, so [[candidates]] exposes
  * only the retained KEYS: the deterministic production pattern is
  * two-pass — sketch for candidates, then exact recount of just those
  * candidates (TextAnalysis.heavyHitters), which makes the final
  * output independent of partitioning and therefore oracle-equal.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]]
    with Serializable {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < capacity => b.updated(w, 1L)
      case None =>
        // decrement-all: each surviving counter absorbs one "vote"
        // against, the arriving item's single vote is spent too
        b.iterator.map { case (k, c) => (k, c - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity) // (capacity+1)-th largest
      sum.iterator.map { case (k, c) => (k, c - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  /** Column form: the retained candidate keys (sorted array<string>)
    * of a capacity-`capacity` Misra-Gries summary over `term`.
    */
  def candidates(term: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity), ExpressionEncoder[String]()).apply(term)
}
