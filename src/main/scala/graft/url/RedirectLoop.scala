package graft.url

/** Redirect-loop classification with the reference's exact priority order
  * (`/root/reference/src/utils/redirect_handler.py:19-74`):
  *
  *  1. chain length ≥ maxRedirects → "max_redirects"
  *  2. newUrl == chain(-2)         → "reverse"   (A → B → A)
  *  3. newUrl == chain(-3)         → "circular"  (A → B → C → A)
  *  4. newUrl == chain(i), i ≤ len-4 → "circular" (longer cycles)
  *  5. newUrl ∈ chain              → "infinite"
  *
  * The ordering is load-bearing: a chain that *could* be classified
  * "infinite" is reported "reverse" if rule 2 fires first (pinned by the
  * reference test `test/utils/test_redirect_handler.py:84-101`).
  */
object RedirectLoop {

  final case class Verdict(isLoop: Boolean, loopType: Option[String], description: Option[String])

  val NoLoop: Verdict = Verdict(isLoop = false, None, None)

  def detect(chain: Seq[String], newUrl: String, maxRedirects: Int = 10): Verdict = {
    val n = chain.length
    if (n >= maxRedirects)
      return Verdict(true, Some("max_redirects"), Some(s"Maximum redirects ($maxRedirects) exceeded"))
    if (n >= 2 && newUrl == chain(n - 2))
      return Verdict(true, Some("reverse"), Some(s"Reverse redirect loop: ${chain(n - 1)} -> $newUrl"))
    if (n >= 3 && newUrl == chain(n - 3))
      return Verdict(true, Some("circular"),
        Some(s"Circular redirect loop: ${chain(n - 2)} -> ${chain(n - 1)} -> $newUrl"))
    if (n >= 4) {
      var i = 0
      while (i < n - 3) {
        if (newUrl == chain(i))
          return Verdict(true, Some("circular"), Some(s"Circular redirect loop detected at position $i"))
        i += 1
      }
    }
    if (chain.contains(newUrl))
      return Verdict(true, Some("infinite"), Some(s"Infinite redirect loop detected: $newUrl"))
    NoLoop
  }
}
