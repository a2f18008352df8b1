package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** mysql_repo.go semantics against embedded Derby: idempotent init,
  * upsert round-trip, updated_at advance on overwrite, delete, the
  * empty-value guard, and position-store internal-traffic detection.
  */
class PositionRepoSpec extends AnyFunSuite with graft.DerbyEngineIsolation {

  private def freshRepo(): JdbcPositionRepo = {
    val url = "jdbc:derby:memory:posrepo" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
    new JdbcPositionRepo(url)
  }

  test("init is idempotent; get on a missing pipeline is None") {
    val repo = freshRepo()
    try {
      repo.init()
      repo.init() // second init must not throw (IF NOT EXISTS semantics)
      assert(repo.get("nope").isEmpty)
    } finally repo.close()
  }

  test("put/get round-trip, overwrite updates stage+value and bumps updated_at") {
    val repo = freshRepo()
    try {
      repo.init()
      val pos1 = """{"current-position":{"binlog-name":"mysql-bin.000001","binlog-pos":4}}"""
      repo.put("pipe-a", "stream", pos1)
      val e1 = repo.get("pipe-a").get
      assert(e1.name == "pipe-a" && e1.stage == "stream" && e1.value == pos1)
      Thread.sleep(20) // let CURRENT_TIMESTAMP advance
      val pos2 = pos1.replace("000001", "000002")
      repo.put("pipe-a", "batch", pos2)
      val e2 = repo.get("pipe-a").get
      assert(e2.stage == "batch" && e2.value == pos2)
      assert(!e2.updatedAt.before(e1.updatedAt))
      // a second pipeline does not interfere
      repo.put("pipe-b", "stream", "v")
      assert(repo.get("pipe-a").get.value == pos2)
      assert(repo.get("pipe-b").get.value == "v")
    } finally repo.close()
  }

  test("delete removes exactly the named pipeline") {
    val repo = freshRepo()
    try {
      repo.init()
      repo.put("a", "stream", "1")
      repo.put("b", "stream", "2")
      repo.delete("a")
      assert(repo.get("a").isEmpty)
      assert(repo.get("b").nonEmpty)
      repo.delete("a") // deleting a missing row is a no-op
    } finally repo.close()
  }

  test("empty position value is rejected (mysql_repo.go:161-163)") {
    val repo = freshRepo()
    try {
      repo.init()
      intercept[IllegalArgumentException](repo.put("p", "stream", ""))
    } finally repo.close()
  }

  test("position-store rows are internal traffic") {
    assert(PositionRepo.isPositionStoreEvent("_graft", "gravity_positions"))
    assert(!PositionRepo.isPositionStoreEvent("app", "gravity_positions"))
    assert(!PositionRepo.isPositionStoreEvent("_graft", "orders"))
  }
}
