package graft

import org.apache.hadoop.conf.Configuration

import graft.sources.segment.SegmentLog

/** An INDEPENDENT rival writer for [[CrossDriverCommitSpec]]: runs in
  * its own forked JVM (own commitLock, own FileSystem instance), reads
  * the live manifest of the table at `args(0)` and appends one commit
  * re-referencing the first segment's data file under a fresh id —
  * the minimal real cross-process committer. Exit 0 = committed. */
object RivalCommitMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val fs = SegmentLog.fs(root, new Configuration())
    val m = SegmentLog.read(fs, root).getOrElse(
      sys.error(s"no table at $root"))
    val v = SegmentLog.commit(fs, root, m.schema,
      Seq(m.segments.head.copy(id = -1L)), truncate = false)
    println(s"RIVAL committed v$v")
  }
}
