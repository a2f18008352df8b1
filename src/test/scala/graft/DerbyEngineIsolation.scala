package graft

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shuts the embedded Derby engine down after each mixed-in suite.
  *
  * All suites run sequentially in ONE forked JVM, and embedded Derby is a
  * JVM-singleton engine: in-memory databases created by a suite live until
  * the ENGINE shuts down, so without this hook every Derby-touching suite
  * inherits the accumulated databases (and their background post-commit
  * daemons) of every suite that ran before it — the lifecycle exposure
  * behind the one-in-a-full-run `BaseContainerHandle.deleteObserver` NPE
  * (Derby-internal, passed 10/10 in isolation). A full engine shutdown
  * discards all in-memory databases and stops the daemons; the autoloaded
  * JDBC driver reboots the engine on the next `getConnection`, so the next
  * suite starts from a clean engine instead of suite #62's leftovers.
  */
trait DerbyEngineIsolation extends BeforeAndAfterAll { this: Suite =>
  override protected def afterAll(): Unit = {
    try {
      java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
      ()
    } catch {
      // XJ015 ("Derby system shutdown") is the SUCCESS state of a full
      // engine shutdown; any other SQLException means the engine was never
      // booted by this suite — either way no engine state crosses the
      // suite boundary, which is the only contract here.
      case _: java.sql.SQLException => ()
    }
    // a full shutdown DEREGISTERS the driver from DriverManager and JDBC
    // autoloading runs only once per JVM — without an explicit re-register
    // the next suite's getConnection dies with "No suitable driver".
    // Instantiating EmbeddedDriver re-registers it (and defers engine
    // boot to the next connection).
    new org.apache.derby.jdbc.EmbeddedDriver()
    super.afterAll()
  }
}
