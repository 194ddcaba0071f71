package graft

import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** End-to-end dry run of the fixture-regeneration re-pin loop (VERDICT r6
  * #5): the loop had never fired in anger, so this spec fires it —
  *
  *  1. copy the REAL sf0.01 fixture and perturb one document's text (a
  *     content regen, exactly what the upstream generator did mid-round-4);
  *  2. run the REAL `Verify.run` against it: the content fingerprint must
  *     mismatch, pins must be recorded-not-enforced, and `repin.json` must
  *     carry fresh rows + checksums;
  *  3. apply the REAL `tools/repin.py` to a COPY of the source tree and
  *     assert the `.expectAtGate` literals and `pinnedFixtureFp` now hold
  *     exactly the freshly measured values — the enforcement precondition a
  *     recompile would bake in;
  *  4. re-run `Verify.run` on the same perturbed fixture and assert the
  *     measurements are IDENTICAL — the determinism that guarantees the
  *     re-applied pins re-enforce green in the same session.
  *
  * The only step not exercised is the recompile itself (a test cannot
  * rebuild its own JVM); step 3's literal equality plus step 4's stability
  * are jointly equivalent to it.
  */
class RepinDryRunSpec extends SparkSpec {

  /** Two cheap pinned (no-oracle) queries. The stemmer wordcounts that
    * originally played this role gained golden VALUES oracles in r8, the
    * LSH pins that replaced them became full SQL gates in r9, and the ANN
    * pins became pinned-model [sql] gates in r12 — so the dry run fires on
    * two of the five remaining seeded block fits, both over the featurized
    * documents (the step-1 perturbation shifts their input). */
  private val pins = Set("q_kmeans_blocks", "q_bisecting_blocks")

  private val base = Paths.get("/tmp/graft_repin_dryrun")

  private def rm(p: Path): Unit =
    if (Files.exists(p)) s"rm -rf ${p.toString}".!

  private def slurp(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  test("regen detection -> repin.json -> repin.py -> stable re-measure") {
    rm(base); Files.createDirectories(base)
    // ---- 1. perturbed fixture copy (dir must end in sf0.01 for atGate)
    val fx = base.resolve("sf0.01")
    assert(s"cp -r /root/testdata/sf0.01 ${fx.toString}".! == 0)
    val docs = spark.read.parquet(s"$fx/documents.parquet")
    import org.apache.spark.sql.functions._
    val perturbed = docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit(" regenx")))
        .otherwise(col("text")))
    val tmpOut = base.resolve("documents_new.parquet").toString
    perturbed.write.mode("overwrite").parquet(tmpOut)
    rm(fx.resolve("documents.parquet"))
    assert(s"mv $tmpOut ${fx.resolve("documents.parquet")}".! == 0)
    val newFp = Verify.fixtureFingerprint(spark, fx.toString)
    assert(newFp != Verify.pinnedFixtureFp,
      "perturbation must change the content fingerprint")

    // ---- 2. real Verify.run: pins recorded, not enforced; repin.json out
    val out1 = base.resolve("out1").toString
    Verify.run(spark, fx.toString, out1, Some(pins), printChecks = false)
    val gates = slurp(Paths.get(s"$out1/gate_checks.json"))
    pins.foreach { p =>
      assert(gates.contains(s""""$p""""), s"$p missing from gate_checks")
    }
    assert(gates.contains("pin not enforced"),
      "stale-generation pins must be recorded, not enforced")
    val repinPath = Paths.get(s"$out1/repin.json")
    assert(Files.exists(repinPath), "repin.json must be written on regen")
    val repin = slurp(repinPath)
    assert(repin.contains(s""""fixture_fp":"$newFp""""))
    // parse the fresh measurements (flat known shape; no json lib on CP)
    def pinOf(name: String): (Long, String) = {
      val m = (s""""$name":\\s*\\{"rows":(\\d+),"checksum":"(\\d+)"\\}""").r
        .findFirstMatchIn(repin)
        .getOrElse(fail(s"no fresh measurement for $name in repin.json"))
      (m.group(1).toLong, m.group(2))
    }
    val fresh = pins.map(p => p -> pinOf(p)).toMap
    fresh.foreach { case (p, (rows, _)) =>
      assert(rows > 0, s"$p measured 0 rows on the perturbed fixture")
    }

    // ---- 3. real repin.py against a copy of the source tree
    val srcCopy = base.resolve("src")
    assert(s"cp -r src/main/scala ${srcCopy.toString}".! == 0)
    val rc = Process(Seq("python3", "tools/repin.py",
      repinPath.toString, srcCopy.toString)).!
    assert(rc == 0, "repin.py must apply every pin")
    val patchedSrc = s"find ${srcCopy.toString} -name *.scala".!!
      .split("\n").filter(_.nonEmpty).map(p => slurp(Paths.get(p))).mkString("\n")
    fresh.foreach { case (p, (rows, cs)) =>
      val lit = s""".expectAtGate(${rows}L, "$cs")"""
      assert(patchedSrc.contains(lit),
        s"patched tree must pin $p at the fresh values ($lit)")
    }
    assert(patchedSrc.contains(s"""pinnedFixtureFp = "$newFp""""),
      "patched Verify.scala must carry the new fingerprint")

    // ---- 4. determinism: a second run measures the identical values,
    // so the re-applied pins would enforce green after recompile
    val out2 = base.resolve("out2").toString
    Verify.run(spark, fx.toString, out2, Some(pins), printChecks = false)
    val repin2 = slurp(Paths.get(s"$out2/repin.json"))
    assert(repin2 == repin,
      "re-measured pins must be bit-identical (enforcement would be green)")

    rm(base)
  }
}
