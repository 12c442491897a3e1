package graft.metrics

/** The WORK-KEYED, CPU-EVIDENCED regression rule (r16 verdict #4),
  * extracted pure so the r16 false-flag window is a canned-snapshot
  * unit test instead of a next-round verdict note.
  *
  * Inputs per query: this run's wall / work (shuffle+input MB) / task
  * CPU / task GC, the committed idle run's same four numbers, and the
  * run-level host-speed ratio (calibration vs the idle run's). The
  * decision ladder, in order:
  *
  *  1. work moved (>25% and >5 MB) → `workChanged`: the PLAN changed;
  *     wall comparison is meaningless and the change is its own signal.
  *  2. wall within 2× of idle (host-ratio discounted) → clean.
  *  3. wall >2× but the query's OWN cpu held near idle (≤1.5×, with
  *     ≥5 s of idle cpu so the ratio carries signal) → `suspects`:
  *     scheduling delay by definition — a co-tenant burst inflates
  *     wall while task cpu stays flat (the r16 g35 shape).
  *  4. wall >2× and idle cpu <5 s → `suspects`: sub-5 s cpu ratios are
  *     noise (the r13 st-family lesson; the r16 g19 shape — 1.7 s of
  *     cpu "quadrupling" to 7 s under a burst).
  *  5. wall >2× and cpu >1.5× idle AND gc >3× idle + 2 s →
  *     `suspects`: the GC-WAKE burst shape (r16 g18 — on this host a
  *     co-tenant inflates task cpu ~2× via hyperthread stealing and
  *     the forced-collection debt shows as a 5× gc delta at
  *     byte-identical shuffle). A real engine regression does not
  *     triple gc at matched work.
  *  6. otherwise → `regressions`: slower at identical work on a
  *     speed-adjusted clock, cpu genuinely up, gc not explaining it —
  *     the one shape that is actually the engine's fault.
  *
  * Residual honesty: a true regression whose extra work is ALSO
  * allocation-heavy (gc-tripling) lands in `suspects`, not
  * `regressions` — it still shows as a wall+cpu drift in the next
  * committed idle run, which is the artifact regressions are judged
  * against; the rule prefers a one-round delay over crying wolf every
  * contended round (three rounds of false flags: r15 ×6, r16 ×3).
  */
object RegressionRule {

  /** One query's numbers from THIS run. */
  final case class Sample(
      name: String,
      wallSec: Double,
      workMb: Double,
      cpuSec: Double,
      gcSec: Double)

  /** The committed idle run's numbers for the same query. */
  final case class IdleRef(
      wallSec: Double,
      workMb: Double,
      cpuSec: Double,
      gcSec: Double)

  final case class Verdict(
      workChanged: Seq[String],
      demoted: Seq[String], // contention-shaped: discounted, not flagged
      regressions: Seq[String])

  def judge(
      samples: Seq[Sample],
      idle: Map[String, IdleRef],
      hostRatio: Double,
      alreadySuspect: Set[String]): Verdict = {
    val workChanged = samples.collect {
      case s if idle.get(s.name).exists { i =>
        math.abs(s.workMb - i.workMb) > 5.0 &&
          math.abs(s.workMb - i.workMb) > 0.25 * math.max(i.workMb, 1.0)
      } => s.name
    }
    val wcSet = workChanged.toSet
    val demoted = scala.collection.mutable.ListBuffer[String]()
    val regressions = samples.collect {
      case s
          if !wcSet.contains(s.name) && !alreadySuspect.contains(s.name) &&
            idle.get(s.name).exists { i =>
              i.wallSec >= 0.5 && i.workMb >= 0.0 &&
                s.wallSec > 2.0 * i.wallSec * hostRatio
            } =>
        val i = idle(s.name)
        val cpuFlat = i.cpuSec >= 5.0 && s.cpuSec <= 1.5 * i.cpuSec
        val cpuNoise = i.cpuSec < 5.0
        val gcWake = s.cpuSec > 1.5 * i.cpuSec &&
          s.gcSec > 3.0 * i.gcSec + 2.0
        if (cpuFlat || cpuNoise || gcWake) { demoted += s.name; None }
        else Some(s.name)
    }.flatten
    Verdict(workChanged, demoted.toList, regressions)
  }
}
