package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.segment.SegmentLog

/** Cross-DRIVER commit contention on the graft-segment log: two
  * independent JVMs (separate processes — separate commitLocks,
  * separate FileSystem instances) colliding on one version slot.
  * The same-driver 8-way stress (ConcurrentCommitSpec) serializes on
  * the JVM lock by design; these tests exercise the layer BELOW it —
  * the store's exclusive create — with a real forked rival process,
  * plus the recovery contract for a rival that CRASHED mid-claim
  * (torn manifest: loud bounded-retry failure, manual delete
  * recovers the slot — the documented operator action; an OWN torn
  * claim self-cleans in claimSlot, but a dead process can't). */
class CrossDriverCommitSpec extends SparkSpec {

  private val Fmt = "graft-segment"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def hconf = spark.sessionState.newHadoopConf()

  private def manifestFile(root: String, v: Long): Path =
    new Path(new Path(root, SegmentLog.LogDir), f"manifest-$v%012d.json")

  /** Fork a genuinely independent writer JVM against `dir` and await. */
  private def runRival(dir: String): Unit = {
    val java = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(java, "-cp", sys.props("java.class.path"),
      "graft.RivalCommitMain", dir)
    val p = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(p.waitFor(120, TimeUnit.SECONDS), "rival JVM timed out")
    assert(p.exitValue() == 0, s"rival JVM failed: exit ${p.exitValue()}")
  }

  test("a second-JVM rival steals the slot mid-commit: exclusive-create collision, rebase, no lost update") {
    val dir = tmp("graft-xdrv-steal")
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .write.format(Fmt).mode("append").save(dir)
    val fs = SegmentLog.fs(dir, hconf)
    val m0 = SegmentLog.read(fs, dir).get
    val rows0 = m0.segments.map(_.rows).sum

    var calls = 0
    val v = SegmentLog.commitRebase(fs, dir) { mOpt =>
      calls += 1
      // the rival lands BETWEEN our manifest read and our slot claim —
      // from another PROCESS, so the only thing serializing us is the
      // filesystem's exclusive create (the cross-driver protocol layer)
      if (calls == 1) runRival(dir)
      val mm = mOpt.get
      // keep-everything maintenance rewrite: a stale first attempt
      // would carry only the pre-rival segment list
      Some(SegmentLog.CommitPlan(mm.schema, mm.segments,
        truncate = true, dataChange = false))
    }

    assert(calls == 2, "the cross-process slot theft must force a re-derivation")
    val mF = SegmentLog.read(fs, dir).get
    assert(mF.version == v)
    assert(mF.version == m0.version + 2, "rival took one slot, our retry the next")
    assert(mF.segments.size == m0.segments.size + 1,
      "the rival's append must survive our rebased replace commit")
    assert(spark.read.format(Fmt).load(dir).count() ==
      rows0 + m0.segments.head.rows)
  }

  test("independent appenders from two JVMs: both commits land, content is the union") {
    val dir = tmp("graft-xdrv-union")
    spark.range(50).select(col("id"), (col("id") % 3).as("k"))
      .write.format(Fmt).mode("append").save(dir)
    val fs = SegmentLog.fs(dir, hconf)
    val m0 = SegmentLog.read(fs, dir).get
    runRival(dir) // appends a re-reference of the FIRST segment's rows
    spark.range(50, 80).select(col("id"), (col("id") % 3).as("k"))
      .write.format(Fmt).mode("append").save(dir) // our follow-up append
    val mF = SegmentLog.read(fs, dir).get
    assert(mF.version == m0.version + 2)
    assert(spark.read.format(Fmt).load(dir).count() ==
      50 + m0.segments.head.rows + 30)
  }

  test("a crashed rival's torn slot fails loudly after bounded retry; deleting it recovers the slot") {
    val dir = tmp("graft-xdrv-torn")
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .write.format(Fmt).mode("append").save(dir)
    val fs = SegmentLog.fs(dir, hconf)
    val m0 = SegmentLog.read(fs, dir).get

    // a rival that died between create() and close(): visible file,
    // unparseable content, nobody left to clean it
    val torn = manifestFile(dir, m0.version + 1)
    val out = fs.create(torn, false)
    out.write("{\"version\": 1, \"schema\": ".getBytes(StandardCharsets.UTF_8))
    out.close()

    // readers must NOT treat the torn slot as absent (that would
    // silently time-travel the table back one version): bounded retry,
    // then a loud, named failure
    val er = intercept[IllegalStateException] { SegmentLog.read(fs, dir) }
    assert(er.getMessage.contains("torn or corrupt"))

    // writers read the latest slot too — same loud failure, no silent
    // slot theft over a manifest that might still be mid-write
    val ew = intercept[Exception] {
      spark.range(5).select(col("id"), (col("id") % 7).as("k"))
        .write.format(Fmt).mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ew).exists(_.contains("torn or corrupt")), s"got: ${msgs(ew)}")

    // the documented operator recovery: delete the torn file — the
    // slot is claimable again and no committed data was lost
    fs.delete(torn, false)
    spark.range(100, 110).select(col("id"), (col("id") % 7).as("k"))
      .write.format(Fmt).mode("append").save(dir)
    val mF = SegmentLog.read(fs, dir).get
    assert(mF.version == m0.version + 1, "the freed slot is reused, not skipped")
    assert(spark.read.format(Fmt).load(dir).count() == 110)
  }
}
