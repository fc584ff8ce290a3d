package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrency: SparkSession is thread-safe, so the reference's
  * TankerThread/connection-sharing machinery (tests/concurrent_*.py)
  * reduces to plain concurrent use of one Env. */
class ConcurrencySpec extends SparkSpec {

  test("concurrent reads from multiple threads") { // concurrent_test.py
    val env = freshEnv()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 8).map { _ =>
        Future(rows(env.view("country", Seq("name")).read()).map(_.head).toSet)
      }
      val results = Await.result(Future.sequence(futures), 120.seconds)
      assert(results.forall(_ == Set("Belgium", "France", "Holland")))
    } finally pool.shutdown()
  }

  test("concurrent writes to different tables") {
    val env = freshEnv()
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val f1 = Future(env.view("country", Seq("name")).write(Seq(Seq("Italy"))))
      val f2 = Future(env.view("member",
        Seq("registration_code", "name")).write(Seq(Seq("099", "Zoe"))))
      Await.result(Future.sequence(Seq(f1, f2)), 120.seconds)
      assert(rows(env.view("country", Seq("name")).read()).size == 4)
      assert(env.fetch("member", """(= registration_code "099")""").isDefined)
    } finally pool.shutdown()
  }

  test("writer lease: fresh foreign lease refuses, stale lease steals") {
    val env = freshEnv()
    val root = env.warehouse.root
    val lease = java.nio.file.Paths.get(root, "_LEASE")
    // the seed writes acquired the lease for this process
    assert(java.nio.file.Files.exists(lease),
      "no _LEASE after a committed write")
    val mine = new String(java.nio.file.Files.readAllBytes(lease), "UTF-8")
    assert(mine.endsWith(s":${ProcessHandle.current().pid()}"), mine)
    // a FRESH lease held by another process: any commit refuses loudly
    // (delete first so no stale Hadoop checksum sidecar survives)
    java.nio.file.Files.delete(lease)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, "._LEASE.crc"))
    java.nio.file.Files.write(lease, "otherhost:999999999".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      env.view("country", Seq("name")).write(Seq(Seq("Italy"))))
    assert(e.getMessage.contains("write-leased") &&
      e.getMessage.contains("otherhost:999999999"), e.getMessage)
    // ...and nothing was committed under the foreign lease
    assert(rows(env.view("country", Seq("name")).read()).size == 3)
    // a lease past its TTL is stealable: age the foreign lease, the
    // same write now succeeds and the lease is ours again
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 11 * 60 * 1000L))
    env.view("country", Seq("name")).write(Seq(Seq("Italy")))
    assert(rows(env.view("country", Seq("name")).read()).size == 4)
    assert(new String(java.nio.file.Files.readAllBytes(lease), "UTF-8")
      == mine)
    // the rename-based steal (r13: atomic vs racing stealers) leaves
    // no tombstone residue behind
    assert(new java.io.File(root).listFiles().forall(
      !_.getName.startsWith("_LEASE.stale-")),
      "steal tombstone left behind")
    // read-only access never needed the lease: a foreign fresh lease
    // does not block reads
    java.nio.file.Files.delete(lease)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, "._LEASE.crc"))
    java.nio.file.Files.write(lease, "otherhost:999999999".getBytes("UTF-8"))
    assert(rows(env.view("country", Seq("name")).read()).size == 4)
  }

  test("link BFS enumerates join paths shortest-first") { // base_test.py:199-227
    val env = freshEnv(seedTeams = false)
    val reg = env.registry
    def fmt(paths: Seq[Seq[graft.schema.Hop]]): Seq[Seq[String]] =
      paths.map(_.map(h => s"${h.viaColumn}:${if (h.m2o) "M2O" else "O2M"}"))
    // member -> country: via team.country, and via team.country.licensees.country
    val mc = fmt(reg.link("member", "country"))
    assert(mc.head == Seq("team:M2O", "country:M2O"), mc)
    assert(mc.exists(_ == Seq("team:M2O", "country:M2O", "licensees:O2M", "country:M2O")), mc)
    // country -> member: teams/members and licensees/member
    val cm = fmt(reg.link("country", "member"))
    assert(cm.toSet.contains(Seq("teams:O2M", "members:O2M")), cm)
    assert(cm.toSet.contains(Seq("licensees:O2M", "member:M2O")), cm)
    // shortest first
    assert(mc.map(_.size) == mc.map(_.size).sorted)
  }
}
