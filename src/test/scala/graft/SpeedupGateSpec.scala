package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parallel-speedup gate — the analog of the reference checker's
  * scalability assertion (checker/checker.sh:96-113 requires the
  * parallel run to beat sequential by >= 1.4-1.7x at 2-4 workers).
  * Every other gate in this repo proves CORRECTNESS is independent of
  * parallelism; none proved the work actually parallelizes — a plan
  * that accidentally serializes (a one-partition exchange, a
  * driver-side loop) would pass all of them. This one runs the
  * flagship + three compute-heavy pipelines on a 6x-replicated sf0.1
  * corpus in two fresh JVMs (a JVM holds one SparkContext, so local[1]
  * vs local[8] cannot share one) and requires >= 1.5x wall-clock
  * speedup — measured as the MEDIAN ratio of three interleaved
  * local[1]/local[8] pairs, because a single pair on this host class
  * can swing 3x on CPU-budget throttling alone (BASELINE.md r14
  * amendment; the r15 false failure).
  *
  * Query and corpus sizing matter here: at plain sf0.1 every query is
  * fixed-overhead-dominated (planning + per-stage scheduling), and
  * local[1] measured on par with local[8] — no signal. The replicated
  * corpus puts enough per-row work (tokenize/hash/agg) on the
  * executors that serialization would show as wall-clock. The floor is
  * deliberately below the ~2.6x the gated set measures at 8 threads
  * (diluted by the flagship's deeper plan): the gate catches
  * accidental serialization, not scheduler-noise-level regressions.
  */
class SpeedupGateSpec extends AnyFunSuite {

  private val Mult = 6
  private val Dir = s"/tmp/graft_speedup_x$Mult"

  // the flagship (inverted_index) plus three scan+aggregate queries
  // over the replicated lineitem (3.6M rows at mult=6). Query choice
  // is deliberate: shallow 1-2-stage plans whose work is pure per-row
  // compute parallelize near-linearly, so a serialization bug shows as
  // a collapse to ~1x. The DEEP pipelines (minhash, APSS) measured
  // only ~1.25x even on the 6x corpus — their wall-clock at this scale
  // is dominated by per-stage scheduling/AQE latency that is
  // thread-count-independent (verified: AQE off does not change it) —
  // so gating on them would test scheduler latency, not parallelism.
  private val Queries = Seq(
    "inverted_index", "q1_pricing", "q6_revenue_delta", "stats_lineitem")

  // same module opens the build forwards to forked JVMs (build.sbt)
  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def probeSeconds(threads: Int): Double = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(java) ++ AddOpens ++ Seq(
      "-Xmx6g",
      "-cp", System.getProperty("java.class.path"),
      "graft.SpeedupProbe", threads.toString, Dir, Mult.toString) ++ Queries
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd)
      .run(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        _ => ()))
      .exitValue()
    assert(rc === 0, s"probe local[$threads] failed:\n$out")
    val line = out.toString.linesIterator
      .find(_.startsWith("SPEEDUP_PROBE_SECONDS"))
      .getOrElse(fail(s"no timing line from local[$threads]:\n$out"))
    line.split(' ')(1).toDouble
  }

  test("flagship + heavy queries speed up >= 1.5x from local[1] to local[8]") {
    // A wall-clock ratio needs 8 real cores to mean anything: on a
    // loaded or small CI host the local[8] probe time-slices and the
    // measured ratio erodes without any code regression. Skip (not
    // fail) there — the gate's subject is the PLAN, and the plan
    // doesn't vary by host.
    assume(Runtime.getRuntime.availableProcessors >= 8,
      "speedup gate needs >= 8 cores; skipping on this host")
    // floor overridable for constrained environments (CI can set
    // -Dgraft.speedup.floor=1.2); the default matches the reference
    // checker's strictest tier
    val floor = sys.props.getOrElse("graft.speedup.floor", "1.5").toDouble
    // fresh corpus per test run (deterministic content, so staleness
    // is only a concern across code changes to the replication itself)
    val dirF = new java.io.File(Dir)
    if (dirF.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dirF)
    }
    // Median of 3 INTERLEAVED pairs, not one pair: this host's CPU
    // budget is documented to swing 3x between identical back-to-back
    // runs (BASELINE.md r14 amendment; the r15 end-of-round artifact
    // recorded 0.64x from a single pair while the in-round run of the
    // same commit measured 2.75x). Interleaving 1,8,1,8,1,8 puts both
    // sides of each ratio inside the same throttling window, and the
    // median outvotes a one-off stall — the same methodology every
    // bench floor in BASELINE.md already uses.
    val Pairs = 3
    val pairs = (1 to Pairs).map { i =>
      val t1 = probeSeconds(1)
      val t8 = probeSeconds(8)
      info(f"pair $i: local[1] = $t1%.1f s, local[8] = $t8%.1f s, " +
        f"ratio = ${t1 / t8}%.2fx")
      (t1, t8)
    }
    val ratios = pairs.map { case (t1, t8) => t1 / t8 }
    val speedup = ratios.sorted.apply(Pairs / 2)
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    info(f"median speedup = $speedup%.2fx over $Pairs pairs " +
      f"(ratios ${ratios.map(r => f"$r%.2f").mkString(", ")}; " +
      f"host load $load%.2f)")
    // the measurement is part of the round's archived record, like
    // bench and correctness — a scalability claim that lives only in a
    // test log dies with the session. Round number inferred from the
    // newest archived bench (this session's bench lands as r{max+1}).
    val n = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .flatMap(f => "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
      .foldLeft(0)(math.max) + 1
    val out = new java.io.PrintWriter(f"SPEEDUP_r$n%02d.json")
    try out.write(
      f"""{"queries":"${Queries.mkString(",")}","mult":$Mult,""" +
        f""""local1_sec":[${pairs.map(p => f"${p._1}%.3f").mkString(",")}],""" +
        f""""local8_sec":[${pairs.map(p => f"${p._2}%.3f").mkString(",")}],""" +
        f""""ratios":[${ratios.map(r => f"$r%.3f").mkString(",")}],""" +
        f""""speedup":$speedup%.3f,"floor":$floor,""" +
        f""""pairs":$Pairs,"interleaved":true,"host_load_avg":$load%.2f}""")
    finally out.close()
    assert(speedup >= floor,
      f"median parallel speedup $speedup%.2fx over $Pairs interleaved " +
        f"pairs below the ${floor}%.1fx gate " +
        f"(ratios ${ratios.map(r => f"$r%.2f").mkString(", ")}) — " +
        "something serialized")
  }
}
