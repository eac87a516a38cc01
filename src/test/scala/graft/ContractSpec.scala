package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the correctness gate silently weakens
  * if an oracle key drifts from its query key, so pin the wiring.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query keys are unique across operator blocks") {
    import graft.operators._
    import graft.streaming.EventStreams
    val blocks = Seq(
      "Analytics" -> Analytics.queries.keySet,
      "Geo" -> Geo.queries.keySet,
      "TextOps" -> TextOps.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "Similarity" -> Similarity.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "EventStreams" -> EventStreams.queries.keySet,
      "Curate" -> Curate.queries.keySet)
    val all = blocks.flatMap(_._2.toSeq)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("oracle SQL contains only printable characters and standard whitespace") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val bad = sql.filter(c => c < ' ' && c != '\n' && c != '\r' && c != '\t')
      assert(bad.isEmpty, s"$k contains control chars: ${bad.map(_.toInt)}")
    }
  }
}
