package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._

/** The repeat gate must FAIL a pinned query whose repeated builds disagree —
  * the r10 q_ann_pq / r11 q_kmeans_blocks flake class. The real registry's
  * pins are deterministic by construction (that is the round's fix), so the
  * failure path is proven here with an injected registry whose query
  * deliberately returns a different frame on its second build. The happy
  * path (agreeing repeats → ok with "repeats":N) rides every production
  * verify run; this spec pins the unhappy one: an explicit red in
  * gate_checks naming the nondeterminism, and the first build's REAL rows
  * still dumped (never a vanished row).
  */
class RepeatGateSpec extends SparkSpec {

  test("a pinned query that drifts across repeats goes red, loudly") {
    val out = "/tmp/graft_repeat_gate"
    if (Files.exists(Paths.get(out)))
      scala.sys.process.Process(Seq("rm", "-rf", out)).!
    val builds = new AtomicInteger(0)
    val nondet = QueryDef.rowsOnly { (s, _) =>
      // build 1 matches the pin; build 2+ yields one extra row — exactly a
      // fit that lands on a different local optimum per run
      val n = if (builds.incrementAndGet() == 1) 5 else 6
      s.range(n).select(col("id"))
    }.expectAtGate(5L)
    // the REAL sf0.01 dir: atGate + fingerprint-enforceable, like the driver.
    // pinRepeats passed EXPLICITLY (not inherited from the env): an ambient
    // SPARK_GRAFT_PIN_REPEATS=1 would never build the injected query a
    // second time and fail this spec spuriously (ADVICE r11).
    Verify.run(spark, "/root/testdata/sf0.01", out,
      Some(Set("q_test_nondet")), printChecks = false,
      defs = Map("q_test_nondet" -> nondet), pinRepeats = 3)
    val checks = new String(
      Files.readAllBytes(Paths.get(s"$out/gate_checks.json")), "UTF-8")
    assert(checks.contains("\"q_test_nondet\""))
    assert(checks.contains("\"ok\":false"), s"repeat drift not red: $checks")
    assert(checks.contains("NONDETERMINISTIC"), s"cause not named: $checks")
    // dump-before-gate: the first build's real rows are in the artifact
    assert(spark.read.parquet(s"$out/q_test_nondet").count() == 5L)
  }

  test("a pinned query stable across repeats records its repeat count") {
    val out = "/tmp/graft_repeat_gate_ok"
    if (Files.exists(Paths.get(out)))
      scala.sys.process.Process(Seq("rm", "-rf", out)).!
    val stable = QueryDef.rowsOnly { (s, _) =>
      s.range(5).select(col("id"))
    }.expectAtGate(5L)
    Verify.run(spark, "/root/testdata/sf0.01", out,
      Some(Set("q_test_stable")), printChecks = false,
      defs = Map("q_test_stable" -> stable), pinRepeats = 3)
    val checks = new String(
      Files.readAllBytes(Paths.get(s"$out/gate_checks.json")), "UTF-8")
    assert(checks.contains("\"ok\":true") && checks.contains("\"repeats\":"),
      s"stable pin not green-with-repeats: $checks")
  }
}
