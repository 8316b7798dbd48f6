package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit contracts of the local-cluster plumbing in [[GraftSession]]:
  * jar discovery (what ships to executor JVMs) and worker-memory parsing.
  * The end-to-end path is exercised by the round-14 gate runs
  * (SPARK_GRAFT_MASTER=local-cluster[...], full Verify + test suite). */
class GraftSessionSpec extends AnyFunSuite with Matchers {

  private def touch(dir: java.io.File, name: String, mtime: Long): Unit = {
    val f = new java.io.File(dir, name)
    Files.write(f.toPath, Array.emptyByteArray)
    f.setLastModified(mtime)
  }

  test("discoverJars ships the newest jar per kind and never a stale " +
      "version, -sources, or -javadoc jar") {
    val root = Files.createTempDirectory("graft_jars").toFile
    val sd = new java.io.File(root, "target/scala-2.13")
    sd.mkdirs()
    val t = System.currentTimeMillis() - 100000
    touch(sd, "graft_2.13-0.1.0.jar", t)           // stale main
    touch(sd, "graft_2.13-0.2.0.jar", t + 5000)    // current main
    touch(sd, "graft_2.13-0.1.0-tests.jar", t)     // stale tests
    touch(sd, "graft_2.13-0.2.0-tests.jar", t + 5000) // current tests
    touch(sd, "graft_2.13-0.2.0-sources.jar", t + 9000)
    touch(sd, "graft_2.13-0.2.0-javadoc.jar", t + 9000)
    val names = GraftSession.discoverJars(root).map(_.getName)
    names should contain theSameElementsAs
      Seq("graft_2.13-0.2.0-tests.jar", "graft_2.13-0.2.0.jar")
  }

  test("discoverJars is empty (not a crash) when target/ or the scala dir " +
      "is missing") {
    val root = Files.createTempDirectory("graft_nojars").toFile
    GraftSession.discoverJars(root) shouldBe empty
    new java.io.File(root, "target").mkdirs()
    GraftSession.discoverJars(root) shouldBe empty
  }

  test("workerMemMb parses the third local-cluster field and ignores " +
      "non-cluster masters") {
    GraftSession.workerMemMb("local-cluster[2,16,4096]") shouldBe Some("4096")
    GraftSession.workerMemMb("local-cluster[ 2 , 4 , 2048 ]") shouldBe Some("2048")
    GraftSession.workerMemMb("local[32]") shouldBe None
    // malformed bracket: no silent garbage, just no default applied
    GraftSession.workerMemMb("local-cluster[2,16]") shouldBe None
  }
}
