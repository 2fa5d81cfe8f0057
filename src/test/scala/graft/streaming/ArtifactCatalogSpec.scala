package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-13 verdict #4: make the "every memoized artifact has a live
 * twin" claim CI, the way CoverageMapSpec did for queries. The spec
 * harvests every ModelCache.memo / memoIndex / meter tag from the main
 * source tree and pins each tag's BASE name to an entry in
 * [[ArtifactMaintenance.liveTwins]]; factory-valued entries must
 * resolve to a real member via reflection. A new memoized artifact
 * without a streamed twin (or an explicit frozen/landed rationale)
 * fails the build here.
 */
class ArtifactCatalogSpec extends AnyFunSuite {

  /** All memo tags in src/main, harvested textually (tags are string
    * literals near the call site; interpolation params are part of the
    * literal and stripped by [[base]]). */
  private def harvestTags(): Set[String] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    val walk = java.nio.file.Files.walk(root)
    val files = try {
      val it = walk.iterator()
      val b = List.newBuilder[java.nio.file.Path]
      while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".scala")) b += p }
      b.result()
    } finally walk.close()
    // POSITION-anchored harvest (ADVICE r13): the tag is the argument
    // at a fixed index — memo/memoIndex(corpus, tag), meter(tag) — so
    // split the call's top-level arguments with a paren/quote-aware
    // scan and read exactly that slot; an earlier argument containing
    // a string literal can no longer be mis-harvested as the tag
    val call = """ModelCache\s*\.\s*(memoIndex|memo|meter)\s*\(""".r
    files.flatMap { p =>
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      call.findAllMatchIn(txt).flatMap { m =>
        val idx = if (m.group(1) == "meter") 0 else 1
        topLevelArgs(txt, m.end).lift(idx).map(_.trim).collect {
          case a if a.startsWith("\"") =>
            a.stripPrefix("\"").takeWhile(_ != '"')
          case a if a.startsWith("s\"") => // interpolated tag literal
            a.stripPrefix("s\"").takeWhile(_ != '"')
        }
      }
    }.toSet
  }

  /** Top-level comma-split of an argument list starting at `start`
    * (the index just past the opening paren): tracks nesting across
    * ()/[]/{} and skips separators inside string literals; stops at
    * the call's own closing paren. */
  private def topLevelArgs(txt: String, start: Int): List[String] = {
    val args = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = start
    var done = false
    while (i < txt.length && !done) {
      val c = txt.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < txt.length) { cur += c; i += 1; cur += txt.charAt(i) }
        else { if (c == '"') inStr = false; cur += c }
      } else c match {
        case '"' => inStr = true; cur += c
        case '(' | '[' | '{' => depth += 1; cur += c
        case ')' if depth == 0 => done = true
        case ')' | ']' | '}' => depth -= 1; cur += c
        case ',' if depth == 0 => args += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    args += cur.toString
    args.result()
  }

  /** Parameter-stripped base name: cut at the first '|'; drop a
    * trailing interpolated suffix like `-$rareMax`. */
  private def base(tag: String): String =
    tag.split('|').head.replaceAll("-\\$[A-Za-z]+$", "")

  test("every ModelCache tag has a liveTwins entry; the harvest itself is alive") {
    val tags = harvestTags()
    // sentinels: if the regex rots, these disappear and the test fails
    // HERE rather than silently passing an empty set
    Seq("bpe-merges|$m", "lsh-pairs", "bigram-lm").foreach { s =>
      assert(tags.contains(s), s"harvest lost sentinel tag $s — regex rotted? got: $tags")
    }
    val bases = tags.map(base)
    val missing = bases -- ArtifactMaintenance.liveTwins.keySet
    assert(missing.isEmpty,
      s"memoized artifacts with NO streamed twin catalogued: ${missing.toSeq.sorted.mkString(", ")} — " +
        "add the store (and its entry in ArtifactMaintenance.liveTwins) or document frozen:/landed:")
    // and no stale catalog rows pointing at tags that no longer exist
    val stale = ArtifactMaintenance.liveTwins.keySet -- bases
    assert(stale.isEmpty,
      s"liveTwins catalogs tags no code memoizes: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("factory-valued twin entries resolve to real members") {
    ArtifactMaintenance.liveTwins.foreach { case (tag, twin) =>
      if (!twin.startsWith("frozen:") && !twin.startsWith("landed:")) {
        val ok = twin match {
          case "ArtifactMaintenance.NearDupLabelStore" =>
            // inner class — resolvable by name
            try { Class.forName(
              "graft.streaming.ArtifactMaintenance$NearDupLabelStore"); true }
            catch { case _: ClassNotFoundException => false }
          case s if s.startsWith("ArtifactMaintenance.") =>
            val m = s.stripPrefix("ArtifactMaintenance.")
            ArtifactMaintenance.getClass.getMethods.exists(_.getName == m)
          case s if s.startsWith("PQ.") =>
            val m = s.stripPrefix("PQ.")
            graft.llm.PQ.getClass.getMethods.exists(_.getName == m)
          case _ => false
        }
        assert(ok, s"liveTwins($tag) = $twin does not resolve to a real member")
      }
    }
  }

  test("every ManifestArtifact factory has a compaction-capable store (serve+compact round trip exists)") {
    // structural: the ManifestArtifact API itself carries serve/compact;
    // here we just pin that every factory RETURNS a ManifestArtifact so
    // a future store can't sidestep the manifest discipline silently
    val factories = ArtifactMaintenance.getClass.getMethods
      .filter(_.getName.endsWith("Artifact"))
    assert(factories.nonEmpty)
    factories.foreach { f =>
      assert(f.getReturnType.getSimpleName == "ManifestArtifact",
        s"${f.getName} returns ${f.getReturnType} — not manifest-committed")
    }
  }
}
