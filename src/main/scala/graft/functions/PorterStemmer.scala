package graft.functions

/** Porter stemmer (M.F. Porter 1980, "An algorithm for suffix stripping"),
  * following the author's reference implementation including its documented
  * departures from the paper (step-2 `bli→ble`, `logi→log`) — the variant
  * behind the reference's `Stemmer` token filter
  * (`rust/lance-index/src/scalar/inverted/tokenizer.rs:36-108`, tantivy →
  * rust-stemmers "porter").
  *
  * Pure function on lowercase ASCII words; non-alpha input passes through
  * untouched (the tokenizer lowercases first).
  */
object PorterStemmer {

  private def isCons(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m(): the number of vowel→consonant transitions in `s[0, end)`. */
  private def measure(s: CharSequence, end: Int): Int = {
    var n = 0
    var i = 0
    while (i < end && isCons(s, i)) i += 1
    while (i < end) {
      while (i < end && !isCons(s, i)) i += 1
      if (i < end) {
        n += 1
        while (i < end && isCons(s, i)) i += 1
      }
    }
    n
  }

  private def containsVowel(s: CharSequence, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (!isCons(s, i)) return true; i += 1 }
    false
  }

  private def endsDoubleCons(s: CharSequence, end: Int): Boolean =
    end >= 2 && s.charAt(end - 1) == s.charAt(end - 2) && isCons(s, end - 1)

  /** *o: stem ends cvc where the final c is not w, x, or y. */
  private def endsCvc(s: CharSequence, end: Int): Boolean = {
    if (end < 3) return false
    if (!isCons(s, end - 1) || isCons(s, end - 2) || !isCons(s, end - 3)) return false
    val c = s.charAt(end - 1)
    c != 'w' && c != 'x' && c != 'y'
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // tokenizer guarantees lowercase; skip digits etc.
      i += 1
    }
    val b = new StringBuilder(word)

    def ends(suffix: String): Boolean =
      b.length >= suffix.length &&
        b.substring(b.length - suffix.length) == suffix
    def stemLen(suffix: String): Int = b.length - suffix.length
    def setTo(suffix: String, repl: String): Unit =
      b.replace(b.length - suffix.length, b.length, repl)

    // rule table application: first (longest-first) matching suffix wins the
    // step; replace only if m(stem) > threshold
    def ruleStep(minM: Int, rules: (String, String)*): Boolean = {
      for ((suf, repl) <- rules.sortBy(-_._1.length)) {
        if (ends(suf)) {
          if (measure(b, stemLen(suf)) > minM) setTo(suf, repl)
          return true // a matched suffix ends the step even if m fails
        }
      }
      false
    }

    // ---- step 1a
    if (ends("sses")) setTo("sses", "ss")
    else if (ends("ies")) setTo("ies", "i")
    else if (ends("ss")) ()
    else if (ends("s")) setTo("s", "")

    // ---- step 1b
    if (ends("eed")) {
      if (measure(b, stemLen("eed")) > 0) setTo("eed", "ee")
    } else {
      val removed =
        if (ends("ed") && containsVowel(b, stemLen("ed"))) { setTo("ed", ""); true }
        else if (ends("ing") && containsVowel(b, stemLen("ing"))) { setTo("ing", ""); true }
        else false
      if (removed) {
        if (ends("at") || ends("bl") || ends("iz")) b.append('e')
        else if (endsDoubleCons(b, b.length)) {
          val c = b.charAt(b.length - 1)
          if (c != 'l' && c != 's' && c != 'z') b.setLength(b.length - 1)
        } else if (measure(b, b.length) == 1 && endsCvc(b, b.length)) b.append('e')
      }
    }

    // ---- step 1c
    if (ends("y") && containsVowel(b, stemLen("y"))) setTo("y", "i")

    // ---- step 2 (m > 0), incl. the reference implementation's departures
    ruleStep(0,
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "bli" -> "ble", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
      "logi" -> "log")

    // ---- step 3 (m > 0)
    ruleStep(0,
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")

    // ---- step 4 (m > 1); (s)ion requires the stem to end in s or t
    locally {
      val plain = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
      val matched = (plain.map(s => (s, false)) :+ ("ion", true))
        .sortBy(-_._1.length)
        .find { case (suf, _) => ends(suf) }
      matched.foreach { case (suf, needSt) =>
        val l = stemLen(suf)
        val stOk = !needSt || (l > 0 && (b.charAt(l - 1) == 's' || b.charAt(l - 1) == 't'))
        if (stOk && measure(b, l) > 1) setTo(suf, "")
      }
    }

    // ---- step 5a
    if (ends("e")) {
      val l = stemLen("e")
      val m = measure(b, l)
      if (m > 1 || (m == 1 && !endsCvc(b, l))) setTo("e", "")
    }

    // ---- step 5b
    if (b.length > 1 && b.charAt(b.length - 1) == 'l' &&
        endsDoubleCons(b, b.length) && measure(b, b.length) > 1)
      b.setLength(b.length - 1)

    b.toString
  }
}
