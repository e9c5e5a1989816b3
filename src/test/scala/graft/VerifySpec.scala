package graft

import org.scalatest.funsuite.AnyFunSuite

/** The dump-count gate (VERDICT r18 item 3): [[Verify.missingDumps]] is
  * the runtime complement of SparkEntrySpec's source-text duplicate-key
  * guard — a declared query whose dump directory never landed (the r18
  * q_rbo shadowing shape) must be reported, while committed dumps and
  * stale extras must not. No Spark session needed: the check is pure
  * filesystem.
  */
class VerifySpec extends AnyFunSuite {

  private def withTempDir(f: java.io.File => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("verifyspec").toFile
    try f(d)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(d)
    }
  }

  private def commitDump(out: java.io.File, name: String): Unit = {
    val d = new java.io.File(out, name)
    assert(d.mkdirs())
    assert(new java.io.File(d, "_SUCCESS").createNewFile())
  }

  test("missingDumps flags absent and uncommitted dumps, not stale extras") {
    withTempDir { out =>
      commitDump(out, "q_ok")
      // partial write: directory exists but no _SUCCESS marker
      assert(new java.io.File(out, "q_partial").mkdirs())
      // stale extra from an earlier run: present on disk, not expected
      commitDump(out, "q_stale")
      val missing = Verify.missingDumps(out.getPath,
        Set("q_ok", "q_partial", "q_never_ran"))
      assert(missing === Set("q_partial", "q_never_ran"))
    }
  }

  test("missingDumps is empty when every expected dump committed") {
    withTempDir { out =>
      Seq("q_a", "q_b").foreach(commitDump(out, _))
      assert(Verify.missingDumps(out.getPath, Set("q_a", "q_b")).isEmpty)
    }
  }
}
