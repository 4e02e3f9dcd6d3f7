package graft.sinks

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, SQLException}
import java.util.Properties
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import java.util.concurrent.locks.ReentrantLock

/** `jdbc:graftserial:<delegate-url>` — a serializing "server gate" in
  * front of any JDBC engine, as a registered `java.sql.Driver`.
  *
  * Why it exists: the reference pipeline's terminal JDBC sink targets a
  * NETWORKED database whose engine mediates concurrent writers inside
  * one server process (and the reference itself ships `tasks.max: 1` on
  * the sink — serialization at the terminal hop is the configured
  * production posture, reference README.md:776-798). Embedded Derby —
  * the only engine in this container — cannot survive >1 concurrent
  * writer at all (captured JVM monitor deadlock inside its buffer
  * manager, round 11), and the container ships neither derbynet nor
  * derbyclient, so the range-partitioned 32-writer layout the sink uses
  * against server-class URLs executed against nothing real. This driver
  * closes that gap: it models a networked server's engine-side
  * mediation at the coarsest granularity — ONE transaction inside the
  * engine at a time — so the full parallel client layout (32 concurrent
  * Spark writer tasks, disjoint ascending key ranges, per-chunk
  * transactions, severity-classified recovery, reconnect churn) can
  * EXECUTE end to end in-process, with the gate standing where the
  * server's lock manager would.
  *
  * Gate protocol (the whole driver): every engine entry from a
  * connection (or any statement/result-set it spawned) must hold the
  * one global fair lock. The lock is taken on entry and released
  * immediately after the call while the connection is in autocommit;
  * once a transaction is open (autoCommit=false), the gate is HELD
  * across calls until `commit`/`rollback`/`close` completes — so two
  * transactions can never interleave inside the embedded engine and the
  * monitor-deadlock preconditions are unconstructible by design. A
  * writer parked at the gate is interruptible, and the wait is BOUNDED
  * ([[SerialDriver.gateTimeoutMs]]): task kill and gate-wait expiry
  * (a holder that died without close() — the corpse case) both surface
  * as `SQLTransientConnectionException`, which the sink's severity
  * classifier already treats as chunk-severe — a wedged gate degrades
  * to per-chunk recovery, never a JVM-wide hang.
  *
  * This is deliberately test-infrastructure-grade concurrency (a real
  * server interleaves row-locked transactions; this gate does not) —
  * what it makes real is the CLIENT side: that N>1 writers with the
  * sink's layout complete correctly against a serializing server
  * boundary. `JdbcUpsert.sinkParallelism` sees the `jdbc:graftserial:`
  * prefix (not `jdbc:derby:`) and keeps the server-class 32-writer
  * default — intended: the gate IS the server.
  */
final class SerialDriver extends Driver {
  import SerialDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours
    val delegateUrl = url.substring(Prefix.length)
    val session = new Session
    // connection creation enters the engine too (e.g. ;create=true
    // bootstraps the database) — gate it like any other engine entry
    session.enter()
    val delegate =
      try DriverManager.getConnection(delegateUrl, info)
      finally session.exitIfAutoCommit()
    SerialDriver.wrap(delegate, session).asInstanceOf[Connection]
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getLogger("graft.sinks.SerialDriver")
}

object SerialDriver {
  val Prefix = "jdbc:graftserial:"

  /** One engine gate per JVM — fair, so queued writers drain FIFO the
    * way a server's accept queue does. A `var` behind a volatile read
    * so [[resetGateForTest]] can replace a gate wedged by a simulated
    * writer corpse (a ReentrantLock is owner-thread-bound: nothing can
    * unlock a dead holder's lock, so recovery = new lock, and the
    * corpse's old lock becomes unreachable garbage). Each Session
    * records the exact lock instance it acquired and releases THAT, so
    * a swap mid-flight can never unlock the wrong gate. */
  @volatile private var gate = new ReentrantLock(true)

  /** How long a writer waits at the gate before concluding the holder
    * is a corpse (died without routing close() through the proxy —
    * abrupt thread death, executor OOM). Expiry surfaces as
    * `SQLTransientConnectionException`, which the sink's severity
    * classifier treats as chunk-severe: a wedged gate degrades to the
    * existing per-chunk recovery path instead of a JVM-wide hang.
    * Generous (3 min) because a legitimate queue of 32 writers behind
    * per-chunk transactions clears in seconds even under host
    * pressure; tests shrink it. */
  @volatile private[graft] var gateTimeoutMs: Long = 180000L

  /** Replace a (possibly corpse-held) gate with a fresh one. Test-only:
    * sessions still holding the old lock keep releasing the old lock;
    * new arrivals queue on the new one. */
  private[graft] def resetGateForTest(): Unit = {
    gate = new ReentrantLock(true)
    consecutiveTimeouts.set(0)
  }

  /** Consecutive gate-wait expiries with no successful acquire in
    * between. After [[GateTimeoutEscalation]] of them the gate is
    * treated as POISONED — the holder died without routing close()
    * through the proxy and nothing can ever unlock its owner-bound
    * lock — and every later arrival fails FAST (one non-blocking
    * tryLock, no wait) with a non-transient SQLException the sink does
    * NOT classify as chunk-severe, so the writer task fails and the
    * job surfaces the defect loudly instead of burning a full
    * gate-timeout per chunk forever (the pre-round-14 behavior). The
    * fast-fail still attempts the lock, so a holder that was merely
    * SLOW (legitimately past the timeout — queued writers saw bounded
    * chunk-severe retries meanwhile) self-heals: the first arrival
    * after the release acquires, resets the counter, and the gate is
    * clean again. No auto-swap of the lock instance — a live holder
    * plus a fresh gate would recreate the ≥2-writer engine deadlock
    * this driver exists to prevent. Operator action on the loud
    * failure: restart the sink JVM (tests: resetGateForTest). */
  private[graft] val GateTimeoutEscalation = 3
  private val consecutiveTimeouts = new AtomicInteger(0)
  private[graft] def consecutiveGateTimeouts: Int = consecutiveTimeouts.get()

  /** Peak number of sessions simultaneously at the gate (holder +
    * queued). The multi-writer spec asserts this exceeded 1: proof that
    * genuinely concurrent writer tasks arrived, rather than the layout
    * having quietly collapsed to one task. AtomicInteger max-accumulate
    * — a volatile read-compare-write lost the larger value exactly when
    * two writers arrived together, i.e. when concurrency was real. */
  private val atGate = new AtomicInteger(0)
  private val peakAtGate = new AtomicInteger(0)
  private[graft] def peakConcurrentWriters: Int = peakAtGate.get()
  private[graft] def resetStats(): Unit = { peakAtGate.set(0) }

  private val registered = new AtomicBoolean(false)

  /** Register with DriverManager (idempotent). Called from object init
    * and from the sink when it sees the prefix, so executor JVMs that
    * never touched this object still resolve the URL. */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      DriverManager.registerDriver(new SerialDriver)
  ensureRegistered()

  /** Per-connection gate bookkeeping. JDBC's threading model (one
    * thread drives a connection at a time — exactly how the sink's
    * foreachPartition uses it) means hold/release always happen on the
    * acquiring thread, which is what ReentrantLock requires. */
  private final class Session {
    @volatile var autoCommit = true // JDBC default on a fresh connection
    /** The lock instance this session holds (null = not holding). Must
      * be the same object enter() acquired — see the gate swap note. */
    @volatile var held: ReentrantLock = null

    def enter(): Unit = if (held == null) {
      val g = gate // pin the instance: lock and unlock the SAME object
      val n = atGate.incrementAndGet()
      peakAtGate.accumulateAndGet(n, Math.max)
      val poisoned = consecutiveTimeouts.get() >= GateTimeoutEscalation
      val acquired =
        try {
          if (poisoned) g.tryLock() // fast-fail, but self-heal if freed
          else g.tryLock(gateTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        } catch {
          case ie: InterruptedException =>
            atGate.decrementAndGet()
            Thread.currentThread().interrupt()
            throw new java.sql.SQLTransientConnectionException(
              "interrupted while queued at the graftserial gate", "08000", ie)
        }
      if (!acquired) {
        atGate.decrementAndGet()
        if (poisoned)
          // NOT chunk-severe (not a connection-class exception, state
          // outside 08/40): propagates and fails the writer task loudly
          throw new java.sql.SQLNonTransientException(
            s"graftserial gate poisoned: $GateTimeoutEscalation consecutive " +
              s"${gateTimeoutMs} ms gate waits expired with no successful " +
              "acquire — the holder died without closing its connection " +
              "and its owner-bound lock can never be released. Failing " +
              "fast instead of timing out per chunk forever; restart the " +
              "sink JVM to recover (tests: resetGateForTest)", "XJGFP")
        val t = consecutiveTimeouts.incrementAndGet()
        throw new java.sql.SQLTransientConnectionException(
          s"gave up after ${gateTimeoutMs} ms queued at the graftserial " +
            "gate — the holder likely died without closing its " +
            "connection; treat as chunk-severe and retry (consecutive " +
            s"timeout $t of $GateTimeoutEscalation before escalation)", "08000")
      }
      consecutiveTimeouts.set(0)
      held = g
    }

    def release(): Unit = if (held != null) {
      val g = held
      held = null
      atGate.decrementAndGet()
      g.unlock()
    }

    def exitIfAutoCommit(): Unit = if (autoCommit) release()
  }

  /** java.sql interfaces whose instances must stay behind the gate:
    * anything a connection spawns that can re-enter the engine. */
  private val gatedTypes: Array[Class[_]] = Array(
    classOf[Connection], classOf[java.sql.Statement],
    classOf[java.sql.PreparedStatement], classOf[java.sql.CallableStatement],
    classOf[java.sql.ResultSet], classOf[java.sql.DatabaseMetaData])

  private def wrap(target: AnyRef, session: Session): AnyRef = {
    val ifaces = gatedTypes.filter(_.isInstance(target))
    Proxy.newProxyInstance(target.getClass.getClassLoader, ifaces,
      new Handler(target, session))
  }

  private final class Handler(target: AnyRef, session: Session)
      extends InvocationHandler {
    override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef = {
      val name = method.getName
      // Proxy hands null (not an empty array) to zero-arg calls like
      // commit()/close()/executeBatch()
      val a = if (args == null) Array.empty[AnyRef] else args
      if (method.getDeclaringClass == classOf[Object])
        return method.invoke(target, a: _*) // hashCode/equals/toString: no engine entry
      session.enter()
      var result: AnyRef = null
      try {
        try result = method.invoke(target, a: _*)
        catch {
          case e: InvocationTargetException =>
            throw Option(e.getCause).getOrElse(e)
        }
        if (name == "setAutoCommit" && target.isInstanceOf[Connection])
          session.autoCommit = a(0).asInstanceOf[java.lang.Boolean].booleanValue()
      } finally {
        // a failed commit/rollback/close still ends the transaction's
        // claim on the engine — never leave the gate held on a corpse
        if (txnBoundary(name, target)) session.release()
        else session.exitIfAutoCommit()
      }
      // spawned engine objects (statements, result sets, metadata) must
      // route their own calls through the same session
      if (result != null && gatedTypes.exists(_.isInstance(result))
          && !Proxy.isProxyClass(result.getClass)) wrap(result, session)
      else result
    }

    private def txnBoundary(name: String, t: AnyRef): Boolean =
      t.isInstanceOf[Connection] &&
        (name == "commit" || name == "rollback" || name == "close")
  }
}
