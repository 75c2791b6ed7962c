package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing + allow checks (RFC 9309, the Robots Exclusion
  * Protocol) — the crawl-politeness fact a responsible corpus pipeline
  * applies BEFORE fetching or keeping a page, pairing with the
  * post-fetch robots-meta noindex gate (HtmlExtract.metaRobots). Like
  * every ingestion kernel here: pure scan-side, never throws, bounded.
  *
  * Engine shape at 100 TB: ONE robots.txt governs every URL of its
  * host, so the parse and the check split — [[RobotsTxt.rules]] parses
  * each robots.txt ONCE into a compact rule struct on the (small)
  * per-domain frame, and [[RobotsTxt.allowed]] is a cheap matcher
  * evaluated per URL after the domains frame broadcast-joins the URL
  * frame on registered domain ([[UrlOps.registeredDomain]]). Parsing
  * per URL would re-run the line scan millions of times per host.
  *
  * Parse semantics (RFC 9309, spec-pinned in RobotsTxtSpec):
  *  - lines are `field: value` with `#` comments stripped; field names
  *    case-insensitive; groups = consecutive `User-agent` lines
  *    followed by their rules;
  *  - group selection: the group whose user-agent product token is the
  *    LONGEST case-insensitive substring of the caller's agent string
  *    wins; the `*` group is the fallback; no match → everything
  *    allowed (the RFC's no-robots default);
  *  - rule matching ([[RobotsTxt.pathMatches]]): byte-wise
  *    case-sensitive prefix match where `*` matches any run and a
  *    trailing `$` anchors the end; the MOST-OCTETS matching rule
  *    prevails, `Allow` winning length ties; an empty `Disallow:`
  *    matches nothing (the classic allow-all idiom);
  *  - `Crawl-delay` (de-facto standard) is per-group, reported in
  *    milliseconds; `Sitemap` lines are global and collected across
  *    groups. */
case class RobotsRules(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = RobotsTxt.Schema
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val c = left.eval(input)
    val a = right.eval(input)
    val content = if (c == null) "" else c.toString
    val agent = if (a == null) "*" else a.toString
    RobotsTxt.parse(content, agent)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsRules =
    copy(left = newLeft, right = newRight)
}

/** The per-URL matcher over a parsed [[RobotsRules]] struct. */
case class RobotsAllowed(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val r = left.eval(input)
    val p = right.eval(input)
    if (r == null) return true // no robots.txt: allowed
    val path = if (p == null) "/" else p.toString
    RobotsTxt.allowedOf(r.asInstanceOf[InternalRow], path)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object RobotsTxt {

  val Schema: StructType = StructType(Seq(
    // parallel arrays: rule paths + allow flags, most-octets-first so
    // the matcher takes the FIRST match (ties already resolved
    // allow-first at parse time)
    StructField("rule_paths", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("rule_allows", ArrayType(BooleanType, containsNull = false),
      nullable = false),
    StructField("crawl_delay_ms", LongType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** Bounds: a hostile robots.txt (some are megabytes of generated
    * lines) keeps only the first `MaxRules` rules of the selected
    * group and the first `MaxSitemaps` sitemap URLs — Google's own
    * parser caps at 500 KiB; these are the analogous guards. */
  val MaxRules = 5000
  val MaxSitemaps = 1000

  /** One pass over the content → the selected group's rules, sorted
    * most-octets-first (allow before disallow within a length). */
  private[graft] def parse(content: String, agent: String): InternalRow = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (uaTokenLength, rules) of the best matching group so far; the
    // wildcard group tracks separately as the fallback
    var bestLen = -1
    var bestRules: List[(String, Boolean)] = Nil
    var bestDelay = -1L
    var starRules: List[(String, Boolean)] = Nil
    var starDelay = -1L
    var starSeen = false
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[Any]

    // current group state
    var curAgents: List[String] = Nil
    var curRules: List[(String, Boolean)] = Nil
    var curDelay = -1L
    var inAgents = false // consecutive UA lines stack into one group

    def closeGroup(): Unit = {
      if (curAgents.nonEmpty) {
        val rules = curRules.reverse
        // RFC 9309 §2.2.1: groups matching the SAME user-agent MERGE —
        // two `User-agent: *` groups (common in concatenated files)
        // combine their rules, as do two groups tied at the winning
        // token length. Delay keeps the first declared value.
        if (curAgents.contains("*")) {
          starRules = starRules ++ rules
          if (starDelay < 0) starDelay = curDelay
          starSeen = true
        }
        // longest product token that is a substring of the agent wins
        val best = curAgents.filter(t => t != "*" && agentLc.contains(t))
          .map(_.length).maxOption.getOrElse(-1)
        if (best >= 0 && best == bestLen) {
          bestRules = bestRules ++ rules
          if (bestDelay < 0) bestDelay = curDelay
        } else if (best > bestLen) {
          bestLen = best; bestRules = rules; bestDelay = curDelay
        }
      }
      curAgents = Nil; curRules = Nil; curDelay = -1L
    }

    content.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgents) closeGroup()
              inAgents = true
              curAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inAgents = false
              // an empty Disallow matches nothing; an empty Allow is
              // equally vacuous — both drop at parse time
              if (value.nonEmpty && curAgents.nonEmpty &&
                  curRules.size < MaxRules)
                curRules ::= (value, field == "allow")
            case "crawl-delay" =>
              inAgents = false
              if (curAgents.nonEmpty)
                curDelay = try math.round(value.toDouble * 1000.0)
                catch { case _: NumberFormatException => curDelay }
            case "sitemap" =>
              // global, group-independent
              if (value.nonEmpty && sitemaps.size < MaxSitemaps)
                sitemaps += UTF8String.fromString(value)
            case _ => inAgents = false // unknown fields skip per RFC
          }
        }
      }
    }
    closeGroup()

    val (rules, delay) =
      if (bestLen >= 0) (bestRules, bestDelay)
      else if (starSeen) (starRules, starDelay)
      else (Nil, -1L)
    // most octets first; Allow before Disallow within equal length, so
    // the matcher's first hit IS the RFC's prevailing rule
    val sorted = rules.sortBy { case (p, allow) =>
      (-p.length, if (allow) 0 else 1) }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(
        sorted.map(r => UTF8String.fromString(r._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]),
      if (delay < 0) null else java.lang.Long.valueOf(delay),
      new GenericArrayData(sitemaps.toArray)))
  }

  /** RFC 9309 path match: literal bytes, `*` matches any run, a
    * trailing `$` anchors the end. Case-sensitive.
    *
    * Segment placement: the first segment anchors at position 0, MIDDLE
    * segments take their earliest occurrence in order (first-fit is
    * optimal — it maximizes the room left for what follows), and when
    * `$` anchors the rule the LAST segment matches at the path's END
    * specifically: a first-fit last segment would false-negative
    * `/a*b$` against `/axbyb` (the early `b` leaves a tail, the final
    * `b` is the match the wildcard semantics require). */
  private[graft] def pathMatches(rule: String, path: String): Boolean = {
    val anchored = rule.nonEmpty && rule.charAt(rule.length - 1) == '$'
    val pat = if (anchored) rule.substring(0, rule.length - 1) else rule
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    if (segs.length == 1)
      return !anchored || pos == path.length
    var i = 1
    val lastIdx = segs.length - 1
    while (i < lastIdx) {
      val s = segs(i)
      val at = path.indexOf(s, pos)
      if (at < 0) return false
      pos = at + s.length
      i += 1
    }
    val last = segs(lastIdx)
    if (anchored)
      // empty last segment = trailing '*' before '$': any tail matches
      last.isEmpty ||
        (path.endsWith(last) && path.length - last.length >= pos)
    else last.isEmpty || path.indexOf(last, pos) >= 0
  }

  /** First matching rule of the most-octets-first list decides;
    * no match → allowed (the RFC default). */
  private[graft] def allowedOf(rules: InternalRow, path: String): Boolean = {
    val paths = rules.getArray(0)
    val allows = rules.getArray(1)
    var i = 0
    val n = paths.numElements()
    while (i < n) {
      if (pathMatches(paths.getUTF8String(i).toString, path))
        return allows.getBoolean(i)
      i += 1
    }
    true
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** Parse once per robots.txt (run this on the per-DOMAIN frame):
    * the selected group's rules for `agent`, its crawl delay, and the
    * file's sitemap URLs. */
  def rules(content: Column, agent: Column): Column =
    B.column(RobotsRules(B.expression(content), B.expression(agent)))

  /** Per-URL allow check over a parsed [[rules]] struct (broadcast the
    * domain frame, then evaluate this on the joined URL frame). */
  def allowed(rules: Column, path: Column): Column =
    B.column(RobotsAllowed(B.expression(rules), B.expression(path)))

  /** Convenience single-shot face (parse + check in one expression) —
    * for ad-hoc use; the split faces are the per-domain scale path. */
  def isAllowed(content: Column, agent: Column, path: Column): Column =
    allowed(rules(content, agent), path)
}
