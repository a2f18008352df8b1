package graft.sources

/** MySQL GTID-set position model — the structured form of the binlog
  * position the reference persists and fixes up after purges
  * (/root/reference pkg/inputs/mysqlstream/binlog_tailer.go:714-763;
  * position encoding pkg/inputs/helper). A GTID set is
  * `uuid:i-j[:k-l...][,uuid2:...]` — per-source-server interval lists.
  *
  * Operations a resuming CDC source needs: parse/render, `contains`
  * (is this txn already applied? → skip on re-tail), `add` (advance on
  * commit), `union` (merge the executed set after failover to a replica),
  * `subtract` (what a new master must still send). Intervals stay
  * normalized (sorted, coalesced), so renders are canonical and
  * comparisons cheap.
  */
final case class GtidSet(intervals: Map[String, Vector[(Long, Long)]]) {

  def contains(uuid: String, txn: Long): Boolean =
    intervals.getOrElse(normalizeUuid(uuid), Vector.empty)
      .exists { case (lo, hi) => txn >= lo && txn <= hi }

  /** Does this set cover every transaction of `other`? (replica is caught
    * up ⇔ master.executed ⊆ replica.executed). Pure interval arithmetic —
    * never iterates transaction ids.
    */
  def covers(other: GtidSet): Boolean = missingFrom(other).isEmpty

  def add(uuid: String, txn: Long): GtidSet =
    union(GtidSet(Map(normalizeUuid(uuid) -> Vector((txn, txn)))))

  def union(other: GtidSet): GtidSet = {
    val keys = intervals.keySet ++ other.intervals.keySet
    GtidSet(keys.map { k =>
      k -> GtidSet.normalize(
        intervals.getOrElse(k, Vector.empty) ++ other.intervals.getOrElse(k, Vector.empty))
    }.toMap)
  }

  /** Transactions in `other` not covered by this set — what a source must
    * still replay after a position handoff.
    */
  def missingFrom(other: GtidSet): GtidSet = {
    val out = other.intervals.map { case (uuid, ivs) =>
      val mine = intervals.getOrElse(uuid, Vector.empty)
      val remaining = ivs.flatMap { case (lo, hi) =>
        // subtract each of my intervals from [lo, hi]
        mine.foldLeft(Vector((lo, hi))) { (acc, m) =>
          acc.flatMap { case (a, b) =>
            if (m._2 < a || m._1 > b) Vector((a, b))
            else {
              val left = if (m._1 > a) Vector((a, m._1 - 1)) else Vector.empty
              val right = if (m._2 < b) Vector((m._2 + 1, b)) else Vector.empty
              left ++ right
            }
          }
        }
      }
      uuid -> GtidSet.normalize(remaining)
    }.filter(_._2.nonEmpty)
    GtidSet(out)
  }

  def isEmpty: Boolean = intervals.isEmpty

  def render: String =
    intervals.toSeq.sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (lo, hi) =>
        if (lo == hi) s"$lo" else s"$lo-$hi"
      }.mkString(":")
    }.mkString(",")

  private def normalizeUuid(u: String): String = u.trim.toLowerCase
}

object GtidSet {
  val empty: GtidSet = GtidSet(Map.empty)

  /** Sorted, coalesced, overlap-free intervals. */
  private[sources] def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ivs.filter(iv => iv._2 >= iv._1).sorted
    sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
      acc.lastOption match {
        case Some((lo, hi)) if iv._1 <= hi + 1 =>
          acc.init :+ (lo, math.max(hi, iv._2))
        case _ => acc :+ iv
      }
    }
  }

  /** Parse `uuid:1-5:7,uuid2:1-3`; blank → empty set. */
  def parse(s: String): GtidSet = {
    val trimmed = Option(s).map(_.trim).getOrElse("")
    if (trimmed.isEmpty) return empty
    GtidSet(trimmed.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      val pieces = part.split(":")
      require(pieces.length >= 2, s"malformed GTID entry: $part")
      val uuid = pieces.head.trim.toLowerCase
      val ivs = pieces.tail.toVector.map { r =>
        r.split("-") match {
          case Array(a) => (a.trim.toLong, a.trim.toLong)
          case Array(a, b) => (a.trim.toLong, b.trim.toLong)
          case _ => throw new IllegalArgumentException(s"malformed interval: $r")
        }
      }
      uuid -> normalize(ivs)
    }.toMap)
  }
}
