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
}
