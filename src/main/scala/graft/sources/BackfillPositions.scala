package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable per-table/per-chunk backfill bookmarks — the analogue of the
  * reference's batch-scan position store (/root/reference
  * pkg/inputs/mysqlbatch/position_value.go: per-table
  * `{min,max,current,done}` persisted through the position cache), kept
  * as a file next to the streaming checkpoint so a killed backfill
  * resumes instead of restarting from zero.
  *
  * Granularity: chunk-level done flags PLUS a mid-chunk `current` cursor
  * (the reference's TablePosition `current` key,
  * position_value.go:44-49) so a straggler chunk killed partway resumes
  * within the chunk rather than re-running whole. State writes are atomic
  * (tmp + rename), one line per chunk:
  * `done \t table \t chunkId \t current \t predicate` (current empty =
  * chunk not started).
  */
final class BackfillPositions(spark: SparkSession, dir: String) {

  private val file = new Path(dir, "backfill_positions.tsv")
  private def fs: FileSystem =
    file.getFileSystem(spark.sparkContext.hadoopConfiguration)

  final case class Chunk(table: String, chunkId: Int, predicate: String,
      done: Boolean, current: Option[String] = None)

  def load(): Map[(String, Int), Chunk] = {
    if (!fs.exists(file)) return Map.empty
    val in = fs.open(file)
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          line.split("\t", 5) match {
            case Array(done, table, id, cur, pred) =>
              (table, id.toInt) -> Chunk(table, id.toInt, pred, done == "1",
                if (cur.isEmpty) None else Some(cur))
            // pre-cursor 4-field lines (older files): no mid-chunk position
            case Array(done, table, id, pred) =>
              (table, id.toInt) -> Chunk(table, id.toInt, pred, done == "1", None)
            case _ =>
              // a position file is the replay-prevention ledger — dropping
              // an unreadable line silently would restart work from zero
              sys.error(s"unreadable backfill position line: '${line.take(80)}'")
          }
        }.toMap
    } finally in.close()
  }

  private def save(state: Map[(String, Int), Chunk]): Unit = {
    val tmp = new Path(dir, s"backfill_positions.tsv.tmp")
    val out = fs.create(tmp, true)
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      state.values.toSeq.sortBy(c => (c.table, c.chunkId)).foreach { c =>
        w.write(s"${if (c.done) "1" else "0"}\t${c.table}\t${c.chunkId}\t" +
          s"${c.current.getOrElse("")}\t${c.predicate}\n")
      }
      w.flush()
    } finally out.close()
    if (fs.exists(file)) fs.delete(file, false)
    if (!fs.rename(tmp, file))
      sys.error(s"backfill position rename failed: $tmp -> $file")
  }

  /** Register a table's chunk plan (first run) and return the chunks still
    * pending. On resume the persisted plan wins — predicates must not be
    * re-derived mid-backfill (the reference freezes min/max at scan start,
    * position_value.go).
    */
  def plan(table: String, predicates: Seq[String]): Seq[Chunk] = {
    val state = load()
    val existing = state.collect { case ((t, _), c) if t == table => c }.toSeq
    if (existing.nonEmpty) existing.filterNot(_.done).sortBy(_.chunkId)
    else {
      val chunks = predicates.zipWithIndex.map { case (p, i) =>
        Chunk(table, i, p, done = false)
      }
      save(state ++ chunks.map(c => (table, c.chunkId) -> c))
      chunks
    }
  }

  def markDone(table: String, chunkId: Int): Unit = {
    val state = load()
    state.get((table, chunkId)).foreach { c =>
      save(state.updated((table, chunkId), c.copy(done = true)))
    }
  }

  /** Persist the mid-chunk cursor: everything up to and including
    * `currentKey` is durably applied (position_value.go `current`).
    */
  def markProgress(table: String, chunkId: Int, currentKey: String): Unit = {
    val state = load()
    state.get((table, chunkId)).foreach { c =>
      save(state.updated((table, chunkId), c.copy(current = Some(currentKey))))
    }
  }

  def allDone(table: String): Boolean = {
    val chunks = load().collect { case ((t, _), c) if t == table => c }
    chunks.nonEmpty && chunks.forall(_.done)
  }

  /** Clear state (backfill completed and handed off to the tail stage). */
  def reset(): Unit = if (fs.exists(file)) fs.delete(file, false)
}

/** Chunk-at-a-time backfill driver: reads each pending chunk, applies it
  * through the (idempotent) sink, then durably marks the chunk done —
  * the reference's LoopInBatch scan loop with resumable positions
  * (mysql_table_scanner.go:187-199 + position_value.go).
  */
final class ResumableBackfill(positions: BackfillPositions) {
  /** @return number of chunks processed this run */
  def run(table: String, predicates: Seq[String],
      readChunk: String => DataFrame, applyChunk: DataFrame => Unit): Int = {
    val pending = positions.plan(table, predicates)
    pending.foreach { c =>
      applyChunk(readChunk(c.predicate))
      positions.markDone(table, c.chunkId)
    }
    pending.size
  }

  /** Keyset-paged scan with mid-chunk resume — the reference's LoopInBatch
    * (mysql_table_scanner.go:187-199): each page is read as `chunk
    * predicate AND key > current`, applied through the idempotent sink,
    * then the page's max key is durably persisted as `current`. A kill
    * between pages resumes AFTER the last durable cursor, re-running at
    * most one page (which the sink absorbs), never the whole chunk.
    *
    * `readPage(predicate, afterKey)` returns the next bounded page (empty
    * = chunk exhausted); `maxKey` extracts the page's highest key.
    *
    * @return number of pages applied this run
    */
  def runPaged(table: String, predicates: Seq[String],
      readPage: (String, Option[String]) => DataFrame,
      applyPage: DataFrame => Unit,
      maxKey: DataFrame => String): Int = {
    val pending = positions.plan(table, predicates)
    var pages = 0
    pending.foreach { c =>
      var cursor = c.current
      var exhausted = false
      while (!exhausted) {
        val page = readPage(c.predicate, cursor)
        if (page.isEmpty) exhausted = true
        else {
          applyPage(page)
          cursor = Some(maxKey(page))
          positions.markProgress(table, c.chunkId, cursor.get)
          pages += 1
        }
      }
      positions.markDone(table, c.chunkId)
    }
    pages
  }
}
