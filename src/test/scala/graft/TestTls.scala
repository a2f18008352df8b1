package graft

import graft.sources.Tls

/** Shared self-signed TLS material for the wire-transport specs:
  * a PKCS12 keystore generated once per JVM by the JDK's own keytool
  * (CN=localhost with SAN dns:localhost + ip:127.0.0.1, so client-side
  * HTTPS endpoint identification passes against loopback), plus an
  * unrelated second keypair for the negative path (a client trusting
  * only the stranger's cert must refuse the real server's handshake).
  */
object TestTls {
  val password = "graft-test"

  private def genKeystore(alias: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val path = dir.resolve(s"$alias.p12").toString
    val cmd = Seq("keytool", "-genkeypair", "-alias", alias, "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-storetype", "PKCS12",
      "-keystore", path, "-storepass", password, "-keypass", password,
      "-dname", "CN=localhost", "-ext", "san=dns:localhost,ip:127.0.0.1")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes, "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $log")
    path
  }

  lazy val keystorePath: String = genKeystore("graft")
  lazy val serverCtx: javax.net.ssl.SSLContext =
    Tls.serverContext(keystorePath, password.toCharArray)
  lazy val clientCtx: javax.net.ssl.SSLContext =
    Tls.clientContext(keystorePath, password.toCharArray)

  /** Trusts a cert the servers never present — handshakes must fail. */
  lazy val strangerClientCtx: javax.net.ssl.SSLContext =
    Tls.clientContext(genKeystore("stranger"), password.toCharArray)
}
