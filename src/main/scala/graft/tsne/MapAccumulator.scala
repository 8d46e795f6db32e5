package graft.tsne

import org.apache.spark.util.AccumulatorV2

import scala.collection.concurrent.TrieMap

/** Distributed `(Int, Double) → Map[Int, Double]` accumulator summing per
  * key — the per-iteration KL-loss side channel (ref:
  * `MapAccumulator.java:27-78`, registered and drained at
  * `TsneHelpers.scala:272,281,299` / `Tsne.scala:97-102`).
  */
final class MapAccumulator extends AccumulatorV2[(Int, Double), Map[Int, Double]] {

  private val map = TrieMap.empty[Int, Double]

  override def isZero: Boolean = map.isEmpty

  override def copy(): MapAccumulator = {
    val acc = new MapAccumulator
    map.foreach { case (k, v) => acc.map.put(k, v) }
    acc
  }

  override def reset(): Unit = map.clear()

  override def add(v: (Int, Double)): Unit =
    map.updateWith(v._1) {
      case Some(cur) => Some(cur + v._2)
      case None      => Some(v._2)
    }

  override def merge(other: AccumulatorV2[(Int, Double), Map[Int, Double]]): Unit =
    other.value.foreach { case (k, v) =>
      map.updateWith(k) {
        case Some(cur) => Some(cur + v)
        case None      => Some(v)
      }
    }

  override def value: Map[Int, Double] = map.toMap
}
