package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The per-JVM scratch root: every dir lands under ONE root (so the
  * shutdown hook's single recursive delete covers all of them), and
  * nothing lands directly in the system tmp dir — the residue standard
  * VERDICT r15 #3 set for CSV fixtures, extended to timed-region
  * artifacts that a returned frame still lazily reads (eager deletion
  * would yank files out from under the plan; exit-time deletion is the
  * correct lifetime).
  */
class ScratchSpec extends AnyFunSuite {

  test("dirs allocate under one shutdown-cleaned root, not bare /tmp") {
    val a = java.nio.file.Paths.get(Scratch.dir("graft_spec_a"))
    val b = java.nio.file.Paths.get(Scratch.dir("graft_spec_b"))
    assert(java.nio.file.Files.isDirectory(a) && java.nio.file.Files.isDirectory(b))
    // same parent for every allocation...
    assert(a.getParent == b.getParent)
    // ...which is the graft_scratch root, one level under the system tmp
    assert(a.getParent.getFileName.toString.startsWith("graft_scratch"))
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      .toRealPath()
    assert(a.getParent.getParent.toRealPath() == tmp,
      s"scratch root must sit directly under $tmp")
    // distinct allocations never collide
    assert(a != b)
  }
}
