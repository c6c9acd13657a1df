package graft.index

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Snapshot-based visibility (the Iceberg-style commit discipline of
  * SURVEY.md §7; reference analog: tantivy `meta.json` opstamp commits,
  * `/root/reference/summa-core/src/components/index_writer_holder.rs:417-423`).
  *
  * A snapshot is a one-line JSON file `_snapshots/v<NNNNNN>.json` listing the
  * live segment ids. Writers publish by writing a temp file and atomically
  * renaming the next version into place; readers resolve the highest version.
  * Old segment data stays on disk until explicitly dropped, so readers
  * holding an older snapshot stay consistent.
  */
final case class Snapshot(version: Int, segments: Seq[Int], buildId: String, createdAt: Long)

object Snapshots {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def snapDir(indexDir: String) = new Path(s"$indexDir/_snapshots")

  def latest(spark: SparkSession, indexDir: String): Option[Snapshot] = {
    val f = fs(spark, indexDir)
    val d = snapDir(indexDir)
    if (!f.exists(d)) return None
    val versions = f.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = f.open(new Path(d, f"v$v%06d.json"))
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      in.close()
      Some(parse(new String(bytes, UTF_8)))
    }
  }

  /** Read a specific snapshot version (time travel). */
  def at(spark: SparkSession, indexDir: String, version: Int): Snapshot = {
    val f = fs(spark, indexDir)
    val p = new Path(snapDir(indexDir), f"v$version%06d.json")
    require(f.exists(p), s"no snapshot version $version at $indexDir")
    val in = f.open(p)
    val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
    in.close()
    parse(new String(bytes, UTF_8))
  }

  /** Publish the next snapshot version. The destination file is created with
    * exclusive semantics (`create(dst, overwrite = false)` — atomic on HDFS,
    * O_EXCL-backed on local FS), so two concurrent committers that compute
    * the same next version cannot silently overwrite each other: the loser
    * gets an exception and retries with the following version. The index is
    * still single-logical-writer (concurrent committers must not retire each
    * other's segments); this only makes version allocation safe.
    */
  def commit(spark: SparkSession, indexDir: String, segments: Seq[Int], buildId: String): Snapshot = {
    val f = fs(spark, indexDir)
    val d = snapDir(indexDir)
    f.mkdirs(d)
    var next = latest(spark, indexDir).map(_.version + 1).getOrElse(1)
    var committed: Option[Snapshot] = None
    var attempts = 0
    while (committed.isEmpty) {
      val snap = Snapshot(next, segments.sorted, buildId, System.currentTimeMillis())
      val dst = new Path(d, f"v$next%06d.json")
      try {
        val out = f.create(dst, false) // exclusive: throws if version exists
        out.write(render(snap).getBytes(UTF_8))
        out.close()
        committed = Some(snap)
      } catch {
        case e: java.io.IOException =>
          attempts += 1
          require(attempts < 1000, s"snapshot commit failed after $attempts attempts: $e")
          next += 1 // lost the version race — try the next slot
      }
    }
    committed.get
  }

  private def render(s: Snapshot): String =
    s"""{"version":${s.version},"segments":[${s.segments.mkString(",")}],""" +
      s""""build_id":"${s.buildId.replace("\"", "")}","created_at":${s.createdAt}}"""

  private[index] def parse(json: String): Snapshot = {
    def longField(name: String): Long = {
      val m = (s""""$name":(-?\\d+)""").r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(sys.error(s"bad snapshot json: $json"))
    }
    val segs = {
      val m = """"segments":\[([0-9, ]*)\]""".r.findFirstMatchIn(json)
        .getOrElse(sys.error(s"bad snapshot json: $json"))
      val body = m.group(1).trim
      if (body.isEmpty) Seq.empty[Int] else body.split(',').map(_.trim.toInt).toSeq
    }
    val buildId = """"build_id":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    Snapshot(longField("version").toInt, segs, buildId, longField("created_at"))
  }
}
