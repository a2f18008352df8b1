package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class GtidSetSpec extends AnyFunSuite {

  test("parse/render round-trips canonically (sorted, coalesced)") {
    val s = GtidSet.parse("BBB:5-7:1-3, aaa:10:1-4:5-6")
    // adjacent/overlapping intervals coalesce; uuids lowercase; output sorted
    assert(s.render == "aaa:1-6:10,bbb:1-3:5-7")
    assert(GtidSet.parse(s.render) == s)
    assert(GtidSet.parse("").isEmpty && GtidSet.parse(null).isEmpty)
  }

  test("contains and add") {
    val s = GtidSet.parse("aaa:1-5:8")
    assert(s.contains("AAA", 3) && s.contains("aaa", 8))
    assert(!s.contains("aaa", 6) && !s.contains("bbb", 1))
    assert(s.add("aaa", 6).render == "aaa:1-6:8")
    assert(s.add("aaa", 7).add("aaa", 6).render == "aaa:1-8")
    assert(s.add("ccc", 1).contains("ccc", 1))
  }

  test("union merges per-uuid interval lists") {
    val a = GtidSet.parse("aaa:1-5,bbb:1-2")
    val b = GtidSet.parse("aaa:4-9,ccc:7")
    assert(a.union(b).render == "aaa:1-9,bbb:1-2,ccc:7")
  }

  test("missingFrom computes the replay gap after a position handoff") {
    val replica = GtidSet.parse("aaa:1-100")
    val master = GtidSet.parse("aaa:1-120:200,bbb:1-3")
    assert(replica.missingFrom(master).render == "aaa:101-120:200,bbb:1-3")
    assert(master.covers(replica))
    assert(!replica.covers(master))
    // equal sets: nothing missing either way
    assert(replica.missingFrom(replica).isEmpty)
  }

  test("covers uses interval arithmetic (large ranges stay cheap)") {
    val big = GtidSet.parse("aaa:1-900000000000")
    val sub = GtidSet.parse("aaa:5-899999999999")
    assert(big.covers(sub) && !sub.covers(big))
  }

  test("properties: render round-trip, union laws, subtract correctness (randomized)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val genSet: Gen[GtidSet] = for {
      nUuids <- Gen.choose(1, 3)
      uuids <- Gen.listOfN(nUuids, Gen.oneOf("aaa", "bbb", "ccc"))
      ivs <- Gen.listOfN(nUuids, Gen.listOfN(3, for {
        lo <- Gen.choose(1L, 40L); len <- Gen.choose(0L, 10L)
      } yield (lo, lo + len)))
    } yield uuids.zip(ivs).foldLeft(GtidSet.empty) { case (acc, (u, iv)) =>
      acc.union(GtidSet(Map(u -> GtidSet.normalize(iv.toVector))))
    }
    val p = Prop.forAll(genSet, genSet) { (a, b) =>
      val roundTrip = GtidSet.parse(a.render) == a
      val commutative = a.union(b).render == b.union(a).render
      val idempotent = a.union(a).render == a.render
      val unionCovers = a.union(b).covers(a) && a.union(b).covers(b)
      // subtract correctness on the bounded domain: membership agrees with
      // the direct definition for every (uuid, txn)
      val missing = a.missingFrom(b)
      val subtractOk = (1L to 60L).forall { t =>
        Seq("aaa", "bbb", "ccc").forall { u =>
          missing.contains(u, t) == (b.contains(u, t) && !a.contains(u, t))
        }
      }
      roundTrip && commutative && idempotent && unionCovers && subtractOk
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }
}
