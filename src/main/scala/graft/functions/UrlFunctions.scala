package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registrable-domain extraction — the key-making
  * stage of DOMAIN-level curation (per-domain caps, blocklists, domain
  * mixing). Both are narrow codegen'd expressions: at 100 TB the URL
  * column never shuffles to be keyed.
  *
  * Canonical form (the widely-used crawl-dedup normalization):
  *   - scheme and host lowercased (path/query case is significant per
  *     RFC 3986 and preserved);
  *   - default ports stripped (http:80, https:443), host trailing dot
  *     dropped;
  *   - empty path becomes "/";
  *   - tracking parameters removed (utm_*, fbclid, gclid, msclkid,
  *     ref, ref_src), remaining query order PRESERVED (reordering
  *     changes semantics for some endpoints); an emptied query drops
  *     its '?';
  *   - the fragment is dropped (never sent to the server).
  * Unparseable input passes through trimmed — a curation pass must not
  * destroy keys it does not understand (the HtmlText entity rule).
  *
  * Registrable domain = public suffix + one label, by the standard PSL
  * algorithm (longest matching rule; '*.' matches one label; '!'
  * exception rules win and shift the suffix one label right; no match →
  * the default '*' rule) over the rules snapshot in
  * graft/psl/suffixes.txt. IP hosts return themselves; a host that IS a
  * public suffix returns NULL (nothing registrable to key on).
  */
object UrlOps {

  // unambiguous tracking params only: a bare `ref` is a legitimate query
  // key on content sites/APIs, so stripping it would collapse distinct URLs
  private val TrackingParams: Set[String] =
    Set("fbclid", "gclid", "msclkid", "ref_src")

  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase
    n.startsWith("utm_") || TrackingParams.contains(n)
  }

  /** (scheme, userinfo, host, port, rest-from-path) or null. */
  private def parse(u: String): Array[String] = {
    val si = u.indexOf("://")
    if (si <= 0) return null
    val scheme = u.substring(0, si)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
      || !scheme.head.isLetter) return null
    val authStart = si + 3
    var i = authStart
    while (i < u.length && u.charAt(i) != '/' && u.charAt(i) != '?' && u.charAt(i) != '#') i += 1
    val auth = u.substring(authStart, i)
    if (auth.isEmpty) return null
    val rest = u.substring(i)
    val at = auth.lastIndexOf('@')
    val (userinfo, hostport) =
      if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1)) else ("", auth)
    // IPv6 literal [..]:port keeps its brackets
    val (host, port) =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close < 0) return null
        val p = hostport.substring(close + 1)
        (hostport.substring(0, close + 1),
          if (p.startsWith(":")) p.substring(1) else "")
      } else {
        val ci = hostport.lastIndexOf(':')
        if (ci >= 0) (hostport.substring(0, ci), hostport.substring(ci + 1))
        else (hostport, "")
      }
    if (host.isEmpty) return null
    Array(scheme, userinfo, host, port, rest)
  }

  def canonicalize(url: UTF8String): UTF8String = {
    val raw = url.toString.trim
    val p = parse(raw)
    if (p == null) return UTF8String.fromString(raw)
    val Array(scheme0, userinfo, host0, port0, rest) = p
    val scheme = scheme0.toLowerCase
    val host = host0.toLowerCase.stripSuffix(".")
    val defaultPort = scheme match {
      case "http" => "80"
      case "https" => "443"
      case "ftp" => "21"
      case _ => ""
    }
    val port = if (port0.isEmpty || port0 == defaultPort) "" else ":" + port0
    // split rest into path / query / fragment(dropped)
    val hashIdx = rest.indexOf('#')
    val noFrag = if (hashIdx >= 0) rest.substring(0, hashIdx) else rest
    val qIdx = noFrag.indexOf('?')
    val path0 = if (qIdx >= 0) noFrag.substring(0, qIdx) else noFrag
    val path = if (path0.isEmpty) "/" else path0
    val query =
      if (qIdx < 0) ""
      else {
        val keptParams = noFrag.substring(qIdx + 1).split("&", -1)
          .filter(param => param.nonEmpty && !isTracking(param.split("=", 2)(0)))
        if (keptParams.isEmpty) "" else "?" + keptParams.mkString("&")
      }
    UTF8String.fromString(scheme + "://" + userinfo + host + port + path + query)
  }

  // ------------------------------------------------------------- PSL

  /** Rules from the resource snapshot: (reversed labels, isException). */
  private lazy val pslRules: Seq[(Array[String], Boolean)] = {
    val in = getClass.getResourceAsStream("/graft/psl/suffixes.txt")
    require(in != null, "missing resource /graft/psl/suffixes.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("//"))
      .map { l =>
        val ex = l.startsWith("!")
        val body = if (ex) l.substring(1) else l
        (body.split('.').reverse, ex)
      }
      .toSeq
    finally src.close()
  }

  private def isIpv4(host: String): Boolean = {
    val parts = host.split('.')
    parts.length == 4 && parts.forall(p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) && p.toInt <= 255)
  }

  /** Longest matching rule's label count for `labels` (reversed host
    * labels), honoring exceptions: returns the public-suffix label
    * count, or 1 (the default '*' rule) when nothing matches.
    */
  private def suffixLen(labels: Array[String]): Int = {
    var best = 1 // PSL default rule: '*'
    var exception = 0
    pslRules.foreach { case (rule, isEx) =>
      if (rule.length <= labels.length) {
        var i = 0
        var ok = true
        while (ok && i < rule.length) {
          val r = rule(i)
          if (r != "*" && r != labels(i)) ok = false
          i += 1
        }
        if (ok) {
          if (isEx) exception = math.max(exception, rule.length)
          else best = math.max(best, rule.length)
        }
      }
    }
    // an exception rule's suffix is the rule minus its leftmost label
    if (exception > 0) exception - 1 else best
  }

  /** IDN hosts (raw UTF-8 labels) fold to their ASCII punycode (xn--) form
    * so both spellings key to the same registrable domain; PSL rules match
    * over ASCII labels. Unconvertible input passes through unchanged (the
    * canonicalize don't-destroy-keys rule).
    */
  private def toAsciiHost(host: String): String =
    if (host.forall(_ < 128)) host
    else try java.net.IDN.toASCII(host) catch { case _: IllegalArgumentException => host }

  def registrableDomain(url: UTF8String): UTF8String = {
    val raw = url.toString.trim
    val p = parse(raw)
    val host0 =
      if (p != null) p(2)
      else if (raw.nonEmpty && !raw.contains('/') && raw.contains('.')) {
        // a bare host may still carry a :port — strip it before the PSL
        // walk so the port never embeds in the last label
        if (raw.startsWith("[")) raw
        else {
          val ci = raw.lastIndexOf(':')
          if (ci >= 0 && raw.substring(ci + 1).forall(_.isDigit)) raw.substring(0, ci)
          else raw
        }
      }
      else return null
    val host = toAsciiHost(host0.toLowerCase.stripSuffix("."))
    if (host.startsWith("[") || isIpv4(host)) return UTF8String.fromString(host)
    val labels = host.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return null
    val sl = suffixLen(labels.reverse)
    if (labels.length <= sl) null // the host IS a public suffix
    else UTF8String.fromString(labels.takeRight(sl + 1).mkString("."))
  }
}

/** Canonicalize a URL string column — see [[UrlOps.canonicalize]]. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_url_canon requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_canon"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.canonicalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlOps.canonicalize($c);")
  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

/** Registrable domain (eTLD+1) of a URL or bare host column — see
  * [[UrlOps.registrableDomain]]. NULL for unkeyable input.
  */
case class RegistrableDomain(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_reg_domain requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_reg_domain"
  override protected def nullSafeEval(input: Any): Any =
    UrlOps.registrableDomain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UrlOps.registrableDomain($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; ${ev.value} = UTF8String.EMPTY_UTF8; }
         |""".stripMargin)
    out
  }
  override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
    copy(child = newChild)
}
