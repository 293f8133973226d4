package graft.operators

import org.apache.spark.sql.SparkSession

/** A CONSISTENT CUT across several versioned-state artifacts — the
  * one-marker argument of the index family (one commit covers
  * centroids + segment, so readers can never mix bases), lifted one
  * level: a pipeline that maintains SEVERAL state directories (q275's
  * verdict → index excision touches an index, a window-hash multiset
  * and a label table) has no transactional tie between them — a crash
  * between member commits leaves the index excised but the labels
  * stale, and nothing records which versions belong together.
  *
  * The manifest is itself a [[VersionedState]] directory whose payload
  * is just `(artifact → stateDir, version)` lines, committed AFTER the
  * member commits land. Readers resolve the LAST manifest and read
  * each member AT its pinned version (`asOf` on the family read paths
  * — [[graft.ann.IvfIndex.assignments]],
  * [[graft.dedup.ExactSubstr.hashCounts]],
  * [[graft.dedup.ClusterState.labels]]), so:
  *
  *  - a crash ANYWHERE between member commits and the manifest commit
  *    is invisible — readers keep resolving the previous cut, whose
  *    member versions are all on disk (member GC keeps the previous
  *    horizon by retention; reclaim only after the manifest moved);
  *  - the pipeline's retry re-runs member refreshes (replay-guarded by
  *    their delta ids — a no-op for the members that DID commit) and
  *    then commits the manifest: exactly-once cut advancement on top
  *    of at-least-once member delivery.
  *
  * q278 gates the torn-cut invisibility end-to-end; StateManifestSpec
  * pins crash-between-members, fail-fast on unknown member versions,
  * and the two-manifest retention.
  */
object StateManifest {

  private val MembersFile = "members"

  /** Commit a cut: `members` maps an artifact name to its state
    * directory and the committed version this cut pins. Fails fast if
    * a pinned version is not committed in its directory (a typo'd or
    * torn member must never become a resolvable cut). Keeps the
    * previous `retain` manifests for readers mid-resolve (the
    * publishIndex retention discipline).
    */
  def commit(spark: SparkSession, manifestDir: String,
             members: Map[String, (String, Long)], retain: Int = 2): Long = {
    require(members.nonEmpty, "a manifest cut needs at least one member")
    members.foreach { case (name, (dir, v)) =>
      require(!name.exists(c => c == '\t' || c == '\n' || c == '\r') &&
          !dir.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"artifact name/dir must not contain tabs or line breaks: $name")
      require(VersionedState.committed(spark, dir).exists(_._1 == v),
        s"manifest member '$name' pins version $v of $dir, which is not " +
          "committed there — refusing to publish a torn cut")
    }
    val prev = VersionedState.currentVersion(spark, manifestDir)
    val next = prev.getOrElse(0L) + 1L
    val lines = members.toSeq.sortBy(_._1).map { case (n, (d, v)) =>
      s"$n\t$d\t$v"
    }
    VersionedState.commit(spark, manifestDir, prev, label = "cut",
      gcBelow = next - retain + 1) { vdir =>
      VersionedState.writeLines(spark, vdir, MembersFile, lines)
    }
  }

  /** The latest cut: artifact name → (stateDir, pinned version). None
    * before the first commit.
    */
  def resolve(spark: SparkSession,
              manifestDir: String): Option[Map[String, (String, Long)]] =
    VersionedState.currentVersion(spark, manifestDir).map { n =>
      readCut(spark, manifestDir, n)
    }

  /** A specific cut by manifest version (time travel across cuts). */
  def readCut(spark: SparkSession, manifestDir: String,
              manifestVersion: Long): Map[String, (String, Long)] =
    VersionedState.readLines(spark,
        VersionedState.versionPath(manifestDir, manifestVersion), MembersFile)
      .map { line =>
        line.split("\t", 3) match {
          case Array(n, d, v) => n -> (d, v.toLong)
          case _ => throw new IllegalStateException(
            s"malformed manifest line in $manifestDir v$manifestVersion: $line")
        }
      }.toMap
}

/** MANIFEST-AWARE member GC — the enforcement for "reclaim only after
  * the manifest moved": a member's `gc()` called by an operator who
  * forgot a retained cut still pins an old horizon would strand that
  * cut's readers. [[StateManifestGc.gcMembers]] computes, per member,
  * the oldest version any RETAINED cut still needs — the BASE of the
  * horizon containing its oldest pin, since an `asOf` read resolves
  * the last base ≤ the pin and unions segments from there — and
  * reclaims strictly below it, never past the member's current
  * horizon. Safe to call after every manifest commit.
  */
object StateManifestGc {

  /** Reclaim every member version no retained manifest cut can still
    * reach. Returns the per-member GC floor applied (member dir →
    * keepFrom).
    */
  def gcMembers(spark: SparkSession,
                manifestDir: String): Map[String, Long] = {
    val cuts = VersionedState.committed(spark, manifestDir).map(_._1)
      .map(v => StateManifest.readCut(spark, manifestDir, v))
    if (cuts.isEmpty) return Map.empty
    val pinsByDir = cuts.flatten.groupMap(_._2._1)(_._2._2)
    pinsByDir.map { case (dir, pins) =>
      val cs = VersionedState.committed(spark, dir)
      val bases = cs.filter(_._2.startsWith("base")).map(_._1).sorted
      def horizonBase(pin: Long): Long =
        bases.filter(_ <= pin).lastOption.getOrElse(
          // a pin below the first surviving base can only happen after
          // a build (which GCs everything and resets cuts' relevance);
          // keep from the oldest base rather than deleting blind
          bases.headOption.getOrElse(Long.MinValue))
      val keepFrom = math.min(pins.map(horizonBase).min,
        bases.lastOption.getOrElse(Long.MinValue))
      if (keepFrom > Long.MinValue)
        VersionedState.gc(spark, dir, keepFrom)
      dir -> keepFrom
    }
  }
}
