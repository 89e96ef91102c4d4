package graft.listing

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** Hudi COPY-ON-WRITE timeline → live-file resolution, without a Hudi
  * runtime — the third member of the table-format trio
  * ([[IcebergSnapshotResolver]], [[DeltaLogResolver]]), and like
  * DELTA a beyond-reference extension: the reference's classifier
  * declares HUDI but can never return it (src/util/glue.ts:13-19).
  *
  * Public Hudi timeline layout (https://hudi.apache.org/docs/timeline):
  * `.hoodie/<instant>.commit` JSON files record completed writes;
  * `partitionToWriteStats` maps each partition path to the write
  * stats of the files written — `fileId` (the file group), `path`
  * (relative to the table root), `fileSizeInBytes`. COW semantics: an
  * upsert writes a NEW versioned file for the same file group, and
  * readers must take exactly the LATEST file slice per group (stale
  * versions stay on disk until cleaning — listing the directory
  * would double-count every updated row).
  * `<instant>.replacecommit` (clustering / insert-overwrite)
  * additionally retires whole file groups via
  * `partitionToReplaceFileIds`.
  *
  * `versionOffset` time-travels: offset n = the state as of the
  * n-th-latest completed instant. All driver-side metadata — commit
  * JSONs are KB-scale regardless of table size.
  */
final class HudiTimelineResolver(hadoopConf: Configuration) {
  private val mapper = new ObjectMapper()

  /** One live data file: absolute path, size, its file group and the
    * commit instant that wrote it, plus the partition path (empty
    * for unpartitioned tables; Hive-style `k=v` segments when the
    * writer used them).
    */
  final case class HudiDataFile(path: String, size: Long, fileId: String,
      instant: String, partitionPath: String)

  private val InstantRe = """(\d+)\.(commit|replacecommit)""".r

  def dataFilesDetailed(location: String, versionOffset: Int = 0): Seq[HudiDataFile] = {
    require(versionOffset >= 0, s"versionOffset must be >= 0: $versionOffset")
    val root = location.stripSuffix("/")
    val tl = new Path(s"$root/.hoodie")
    val fs = tl.getFileSystem(hadoopConf)
    if (!fs.exists(tl)) return Nil
    val completed = fs.listStatus(tl).toSeq.flatMap { st =>
      st.getPath.getName match {
        case InstantRe(instant, kind) => Some((instant, kind, st.getPath))
        case _                        => None
      }
    }.sortBy(_._1)
    if (completed.size <= versionOffset) return Nil
    val upTo = completed.dropRight(versionOffset)

    // fileId -> latest (instant, file); later commits win per group
    val live = scala.collection.mutable.LinkedHashMap.empty[String, HudiDataFile]
    upTo.foreach { case (instant, kind, p) =>
      val in = fs.open(p)
      val node = try mapper.readTree(in) finally in.close()
      if (kind == "replacecommit")
        Option(node.get("partitionToReplaceFileIds")).foreach { m =>
          m.properties().asScala.foreach(_.getValue.elements().asScala
            .foreach(id => live.remove(id.asText())))
        }
      Option(node.get("partitionToWriteStats")).foreach { m =>
        m.properties().asScala.foreach { e =>
          val partition = e.getKey
          e.getValue.elements().asScala.foreach { stat =>
            val fileId = Option(stat.get("fileId")).map(_.asText()).getOrElse("")
            val rel = Option(stat.get("path")).map(_.asText()).getOrElse(
              throw new IllegalStateException(
                s"malformed Hudi commit ${p.getName}: write stat without a path"))
            val size = Option(stat.get("fileSizeInBytes")).map(_.asLong()).getOrElse(-1L)
            val abs = if (rel.contains("://") || rel.startsWith("/")) rel else s"$root/$rel"
            live(fileId) = HudiDataFile(abs, size, fileId, instant, partition)
          }
        }
      }
    }
    live.values.toSeq.sortBy(_.path)
  }
}
