package graft

import org.scalatest.funsuite.AnyFunSuite

class ScratchSpec extends AnyFunSuite {

  test("fastLocalDir elects only a writable, large-enough scratch") {
    // env can't be set from inside the JVM portably; assert the
    // observable contract instead: with no override present, the result
    // is either None or a writable directory under a large-enough tmpfs
    assume(sys.env.get("SPARK_GRAFT_LOCAL_DIR").isEmpty)
    graft.core.Scratch.fastLocalDir() match {
      case None => succeed
      case Some(p) =>
        val d = new java.io.File(p)
        assert(d.isDirectory && d.canWrite, s"elected scratch unusable: $p")
        // the capacity guard: an elected tmpfs must clear the 8 GiB bar,
        // so a Docker-default 64 MB /dev/shm can never be chosen
        assert(d.getUsableSpace >= (8L << 30) - (1L << 30),
          s"elected scratch too small for real shuffles: $p " +
            s"(${d.getUsableSpace} usable)")
    }
  }

  test("configure is a no-op on the builder when no scratch is elected") {
    // contract-level: configure never throws and returns a builder that
    // can still produce a session config map (we don't build a session
    // here — SparkSpec owns the shared one)
    val b = org.apache.spark.sql.SparkSession.builder()
    val out = graft.core.Scratch.configure(b)
    assert(out != null)
  }

  test("a Scratch.configure'd session actually runs on the elected dir") {
    // End-to-end pin for the driver-contract mains (Bench/Verify/Smoke
    // all build their session through Scratch.configure, as does the
    // shared test session): the ELECTED dir must be what the live
    // session's spark.local.dir reads back as — a silent regression here
    // would quietly re-route every shuffle to the slow root disk and
    // re-open the r14 drift story.
    // The election is re-run at ASSERT time while the session elected at
    // BUILD time — the suite's own spills can push /dev/shm across the
    // 8 GiB bar in between, so equality can't be required verbatim.
    // The stable contract: whatever the session carries must be a dir
    // the election could have produced (the tmpfs subdir or the env
    // override), and a current election must match the session unless
    // the bar was crossed mid-suite.
    val spark = SparkSpec.session
    val confDir = spark.conf.getOption("spark.local.dir")
    confDir.foreach { d =>
      // an override is normalized by the election (entries trimmed,
      // unusable ones dropped, absolute-pathed, re-joined) — comparing
      // against the RAW env string would fail a correctly functioning
      // election on "a, b" spacing or a dropped entry. The stable
      // contract: every dir the session carries is an entry the
      // override NAMES (by absolute path), or the tmpfs subdir.
      val overrideEntries = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
        .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        .map(e => new java.io.File(e).getAbsolutePath).toSet
      assert(d.split(",").forall(e =>
        e.startsWith("/dev/shm/") || overrideEntries.contains(e)),
        s"session scratch $d is not an electable dir " +
          s"(override entries: $overrideEntries)")
    }
    graft.core.Scratch.fastLocalDir() match {
      case Some(d) if confDir.isDefined =>
        assert(confDir.contains(d),
          s"session spark.local.dir=$confDir != elected scratch $d")
      case _ => succeed // bar crossed between build and assert: tolerated
    }
  }
}
