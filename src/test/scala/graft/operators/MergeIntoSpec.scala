package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics in BOTH physical strategies (broadcast anti-join
  * and union+reduce): inserts appear, updates replace, deletes remove,
  * untouched base rows pass through, and with a sequence column the LAST
  * change to a key wins (including delete-then-reinsert). Plus the plan
  * contracts each strategy exists for. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0)
  ).toDF("id", "tag", "v")

  private val modes = Seq("broadcast" -> true, "union-reduce" -> false)

  for ((label, bc) <- modes) {
    test(s"[$label] insert / update / delete / passthrough") {
      val changes = Seq(
        (2L, "U", "b2", 22.0),
        (3L, "D", null.asInstanceOf[String], 0.0),
        (4L, "I", "d", 40.0)
      ).toDF("id", "op", "tag", "v")
      val out = MergeInto(base, changes, "id", broadcastChanges = bc)
        .orderBy("id").as[(Long, String, Double)].collect().toSeq
      assert(out === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))
    }

    test(s"[$label] no changes → snapshot unchanged") {
      val empty = Seq.empty[(Long, String, String, Double)]
        .toDF("id", "op", "tag", "v")
      val out = MergeInto(base, empty, "id", broadcastChanges = bc)
        .orderBy("id").as[(Long, String, Double)].collect().toSeq
      assert(out === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    }

    test(s"[$label] sequence column: last change per key wins") {
      val changes = Seq(
        (1L, "U", "a1", 11.0, 1L),
        (1L, "U", "a2", 12.0, 2L), // later seq supersedes
        (2L, "D", null.asInstanceOf[String], 0.0, 1L),
        (2L, "I", "b-back", 25.0, 2L), // re-insert after delete
        (3L, "U", "c1", 31.0, 2L),
        (3L, "D", null.asInstanceOf[String], 0.0, 5L) // delete wins at the end
      ).toDF("id", "op", "tag", "v", "seq")
      val out = MergeInto(base, changes, "id", seqCol = Some("seq"),
          broadcastChanges = bc)
        .orderBy("id").as[(Long, String, Double)].collect().toSeq
      assert(out === Seq((1L, "a2", 12.0), (2L, "b-back", 25.0)))
    }
  }

  test("broadcast strategy: base side joins via broadcast, no sort-merge") {
    val changes = Seq((4L, "I", "d", 40.0)).toDF("id", "op", "tag", "v")
    val plan = MergeInto(base, changes, "id", broadcastChanges = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"base must not be shuffled into a sort-merge join:\n$plan")
  }

  test("union-reduce strategy: one shuffle, no join in the plan") {
    val changes = Seq((4L, "I", "d", 40.0)).toDF("id", "op", "tag", "v")
    val plan = MergeInto(base, changes, "id", broadcastChanges = false)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"union-reduce MERGE must not plan a join:\n$plan")
  }
}
