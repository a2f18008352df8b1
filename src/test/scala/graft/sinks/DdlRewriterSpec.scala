package graft.sinks

import graft.SparkSpec
import graft.sinks.DdlRewriter._

class DdlRewriterSpec extends SparkSpec {

  test("classification of the six replayed statement classes") {
    assert(classify("CREATE DATABASE foo") == CreateDatabase)
    assert(classify("create schema if not exists foo") == CreateDatabase)
    assert(classify("DROP DATABASE foo") == DropDatabase)
    assert(classify("CREATE TABLE t (id INT)") == CreateTable)
    assert(classify("DROP TABLE `d`.`t`") == DropTable)
    assert(classify("ALTER TABLE t ADD COLUMN c INT") == AlterTable)
    assert(classify("RENAME TABLE a TO b") == RenameTable)
    assert(classify("TRUNCATE TABLE t") == Other)
  }

  test("rewrite retargets and injects idempotency guards") {
    assert(rewrite("CREATE DATABASE src", "tgt_db", "t") ==
      Seq("CREATE DATABASE IF NOT EXISTS `tgt_db`"))
    assert(rewrite("DROP DATABASE src", "tgt_db", "t") ==
      Seq("DROP DATABASE IF EXISTS `tgt_db`"))
    assert(rewrite("CREATE TABLE src.t1 (id INT PRIMARY KEY)", "tgt", "t2") ==
      Seq("CREATE TABLE IF NOT EXISTS `tgt`.`t2` (id INT PRIMARY KEY)"))
    assert(rewrite("DROP TABLE t1", "tgt", "t2") ==
      Seq("DROP TABLE IF EXISTS `tgt`.`t2`"))
    assert(rewrite("ALTER TABLE `s`.`t1` ADD COLUMN c INT", "tgt", "t2") ==
      Seq("ALTER TABLE `tgt`.`t2` ADD COLUMN c INT"))
    assert(rewrite("RENAME TABLE a TO b", "tgt", "t2").isEmpty)
    // unknown statements pass through for operator review
    assert(rewrite("TRUNCATE TABLE x", "tgt", "t") == Seq("TRUNCATE TABLE x"))
  }

  test("duplicate-column/key errnos are replay-ignorable (mysql.go:484-511)") {
    assert(ignorableErrnos.contains(1060) && ignorableErrnos.contains(1061))
  }

  test("multi-spec ALTER splits into one statement per spec (TiDB single-spec)") {
    assert(rewrite("ALTER TABLE t ADD COLUMN a INT, ADD COLUMN b VARCHAR(8)", "tgt", "t2") ==
      Seq("ALTER TABLE `tgt`.`t2` ADD COLUMN a INT",
        "ALTER TABLE `tgt`.`t2` ADD COLUMN b VARCHAR(8)"))
    // commas inside type args and quoted defaults do not split
    assert(rewrite(
      "ALTER TABLE t ADD COLUMN d DECIMAL(12,2) DEFAULT 'a,b', DROP COLUMN e", "tgt", "t2") ==
      Seq("ALTER TABLE `tgt`.`t2` ADD COLUMN d DECIMAL(12,2) DEFAULT 'a,b'",
        "ALTER TABLE `tgt`.`t2` DROP COLUMN e"))
  }

  test("bidirectional drop dedupe: first drop executes, its echo is skipped") {
    val d = new DdlDropDeduper()
    assert(d.shouldExecute("DROP TABLE `a`.`t1`"))
    // the echo comes back normalized differently (case, quoting, spacing)
    assert(!d.shouldExecute("drop table a.t1"))
    assert(!d.shouldExecute("DROP TABLE  a.t1"))
    // a different table, and non-drop DDL, always pass
    assert(d.shouldExecute("DROP TABLE a.t2"))
    assert(d.shouldExecute("ALTER TABLE a.t1 ADD COLUMN c INT"))
    assert(d.shouldExecute("ALTER TABLE a.t1 ADD COLUMN c INT")) // alters never dedupe
  }

  test("drop dedupe is time-windowed: a legitimate re-drop after the window executes") {
    var now = 0L
    val d = new DdlDropDeduper(windowMs = 1000, clock = () => now)
    assert(d.shouldExecute("DROP TABLE a.t1"))
    now = 500
    assert(!d.shouldExecute("DROP TABLE a.t1")) // echo inside the window
    now = 2000
    // DROP -> CREATE -> DROP later: the second real drop must replay
    assert(d.shouldExecute("DROP TABLE a.t1"))
  }

  test("alter split respects backslash-escaped quotes inside literals") {
    assert(rewrite(
      """ALTER TABLE t ADD COLUMN c VARCHAR(10) DEFAULT 'a\',b', ADD COLUMN d INT""",
      "tgt", "t2") ==
      Seq("""ALTER TABLE `tgt`.`t2` ADD COLUMN c VARCHAR(10) DEFAULT 'a\',b'""",
        "ALTER TABLE `tgt`.`t2` ADD COLUMN d INT"))
  }
}
