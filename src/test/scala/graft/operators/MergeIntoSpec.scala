package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics: inserts appear, updates replace, deletes remove,
  * untouched base rows pass through, and with a sequence column the LAST
  * change to a key wins (including a delete that later changes resurrect).
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0)
  ).toDF("id", "tag", "v")

  test("insert / update / delete / passthrough") {
    val changes = Seq(
      (2L, "U", "b2", 22.0),
      (3L, "D", null.asInstanceOf[String], 0.0),
      (4L, "I", "d", 40.0)
    ).toDF("id", "op", "tag", "v")
    val out = MergeInto(base, changes, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))
  }

  test("no changes → snapshot unchanged") {
    val empty = Seq.empty[(Long, String, String, Double)]
      .toDF("id", "op", "tag", "v")
    val out = MergeInto(base, empty, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("sequence column: last change per key wins") {
    val changes = Seq(
      (1L, "U", "a1", 11.0, 1L),
      (1L, "U", "a2", 12.0, 2L), // later seq supersedes
      (2L, "D", null.asInstanceOf[String], 0.0, 1L),
      (2L, "I", "b-back", 25.0, 2L), // re-insert after delete
      (3L, "U", "c1", 31.0, 2L),
      (3L, "D", null.asInstanceOf[String], 0.0, 5L) // delete wins at the end
    ).toDF("id", "op", "tag", "v", "seq")
    val out = MergeInto(base, changes, "id", seqCol = Some("seq"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a2", 12.0), (2L, "b-back", 25.0)))
  }

  test("one shuffle, no join in the plan") {
    val changes = Seq((4L, "I", "d", 40.0)).toDF("id", "op", "tag", "v")
    val plan = MergeInto(base, changes, "id")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"MERGE must not plan a join:\n$plan")
  }
}
