package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Dynamic fault injection (reference api/v2/failpoint.go:38-140 +
  * the pingcap/failpoint expression grammar those handlers feed).
  *
  * A failpoint is a named site in the engine that consults this
  * registry on every pass; enabling `name` with an expression makes
  * the site misbehave on purpose. The expression grammar is the
  * public pingcap/failpoint subset the reference's tests actually
  * use:
  *
  *   <expr> ::= <term> ( "->" <term> )*
  *   <term> ::= <count> "*" <action>  |  <pct> "%" <action>  |  <action>
  *   <action> ::= return [ "(" arg ")" ]  |  sleep "(" ms ")"
  *              |  panic [ "(" msg ")" ]  |  off  |  print [ "(" msg ")" ]
  *
  * `N*action` fires the term N times then falls through to the next
  * term (or to disabled when none remain); `N%action` fires the term
  * on N% of evaluations. The upstream library draws that percentage
  * from a PRNG; here it is counter-based (fires on the first N of
  * every 100 hits) so specs stay deterministic — the observable
  * contract (long-run firing rate) is the same, and the divergence
  * is confined to sampling order.
  *
  * Sites live on the DRIVER (foreachBatch bodies, coordinator loops):
  * state in a plain ConcurrentHashMap is visible to every site
  * without any executor-side distribution, exactly like the
  * reference's in-process failpoint.Enable.
  */
object Failpoints {

  /** Thrown by a `panic(...)` term — the injected hard failure. */
  final class FailpointPanic(msg: String) extends RuntimeException(msg)

  sealed trait Action
  final case class Return(arg: Option[String]) extends Action
  final case class Sleep(ms: Long) extends Action
  final case class Panic(msg: String) extends Action
  final case class Print(msg: String) extends Action
  case object Off extends Action

  /** One `->`-chained term: an action plus its firing modifier. */
  final case class Term(action: Action, times: Option[Long], pct: Option[Int])

  private final case class Entry(expr: String, terms: Vector[Term],
                                 hits: AtomicLong)

  private val state = new ConcurrentHashMap[String, Entry]()

  /** Parse + install; IllegalArgumentException on a malformed
    * expression (the reference's failpoint.Enable error → HTTP 500). */
  def enable(name: String, expr: String): Unit = {
    val terms = parse(expr)
    state.put(name, Entry(expr, terms, new AtomicLong(0)))
  }

  def disable(name: String): Unit = state.remove(name)

  def clear(): Unit = state.clear()

  /** Sorted (name, expr) snapshot — ListFailpoints. */
  def list: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    state.asScala.toSeq.map { case (k, e) => k -> e.expr }.sortBy(_._1)
  }

  /** Sorted (name, evaluation count) — the /metrics counter source.
    * Counts evaluations of currently-enabled points (disable drops the
    * series, like DeleteLabelValues on a gauge vec). */
  def hitCounts: Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    state.asScala.toSeq.map { case (k, e) => k -> e.hits.get() }.sortBy(_._1)
  }

  /** Evaluate the failpoint at `name`. Disabled or non-firing → None.
    * A firing `return` yields Some(arg); `sleep` blocks then yields
    * None; `panic` throws [[FailpointPanic]]; `off`/`print` are
    * no-ops (off consumes its firing window doing nothing, the
    * upstream semantics for temporarily masking a site). */
  def eval(name: String): Option[String] = {
    val e = state.get(name)
    if (e == null) None
    else {
      val hit = e.hits.getAndIncrement()
      pick(e.terms, hit) match {
        case None => None
        case Some(t) => t.action match {
          case Return(arg) => Some(arg.getOrElse(""))
          case Sleep(ms) => Thread.sleep(ms); None
          case Panic(msg) => throw new FailpointPanic(msg)
          case Print(msg) => println(s"failpoint $name: $msg"); None
          case Off => None
        }
      }
    }
  }

  /** Convenience site: fire-as-error. A firing `return`/`panic` term
    * surfaces as a thrown exception carrying the failpoint's arg —
    * the shape every injected-batch-failure site wants. */
  def evalThrow(name: String): Unit =
    eval(name).foreach(arg =>
      throw new FailpointPanic(if (arg.isEmpty) name else arg))

  /** Walk the `->` chain: counted terms consume `hit` indexes in
    * order; a percentage term fires on the first pct of every 100
    * hits that reach it; an unmodified term fires always. */
  private def pick(terms: Vector[Term], hit: Long): Option[Term] = {
    var remaining = hit
    var i = 0
    while (i < terms.length) {
      val t = terms(i)
      t.times match {
        case Some(n) =>
          if (remaining < n) return Some(t)
          remaining -= n
        case None =>
          t.pct match {
            case Some(p) => return if (remaining % 100 < p) Some(t) else None
            case None => return Some(t)
          }
      }
      i += 1
    }
    None // every counted term exhausted
  }

  private[streaming] def parse(expr: String): Vector[Term] = {
    val trimmed = expr.trim
    require(trimmed.nonEmpty, "empty failpoint expression")
    val terms = trimmed.split("->").toVector.map { raw =>
      val s = raw.trim
      val (mod, rest) = s.indexOf('*') match {
        case i if i > 0 && s.take(i).forall(_.isDigit) =>
          (Left(s.take(i).toLong), s.drop(i + 1))
        case _ => s.indexOf('%') match {
          case i if i > 0 && s.take(i).forall(_.isDigit) =>
            (Right(s.take(i).toInt), s.drop(i + 1))
          case _ => (Left(-1L), s)
        }
      }
      val (head, arg) = rest.indexOf('(') match {
        case -1 => (rest.trim, None)
        case i =>
          require(rest.endsWith(")"), s"unbalanced parens in term: $s")
          (rest.take(i).trim,
            Some(rest.substring(i + 1, rest.length - 1).stripPrefix("\"").stripSuffix("\"")))
      }
      val action = head match {
        case "return" => Return(arg)
        case "sleep" => Sleep(arg.map(_.trim.toLong)
          .getOrElse(throw new IllegalArgumentException(s"sleep needs a duration: $s")))
        case "panic" => Panic(arg.getOrElse("failpoint panic"))
        case "print" => Print(arg.getOrElse(""))
        case "off" => Off
        case other => throw new IllegalArgumentException(s"unknown failpoint action: $other")
      }
      mod match {
        case Left(-1L) => Term(action, None, None)
        case Left(n) => Term(action, Some(n), None)
        case Right(p) =>
          require(p >= 0 && p <= 100, s"percentage out of range: $p")
          Term(action, None, Some(p))
      }
    }
    // A percentage or unmodified term never exhausts, so any term
    // chained after one is unreachable under pick(); reject the
    // expression up front instead of silently dropping its tail.
    terms.dropRight(1).zipWithIndex.foreach { case (t, i) =>
      require(t.times.isDefined,
        s"term ${i + 1} of '$trimmed' is terminal (only N*action terms may be " +
          "followed by another term)")
    }
    terms
  }
}
