package graft.functions

/** Snowball stemmers for the FTS tokenizer pipeline's `language` config —
  * the reference drives tantivy's `Stemmer::new(language)` over the full
  * Snowball set (`rust/lance-index/src/scalar/inverted/tokenizer.rs:47,256`);
  * this engine implements the published Snowball algorithm definitions
  * (snowballstem.org) for the languages below, plus Porter English
  * ([[PorterStemmer]]).
  *
  * All stemmers are pure functions on lowercase words (the tokenizer
  * lowercases first). Correctness is spec-gated per language on traced
  * vocabulary cases (FtsSpec), the same discipline the Porter stemmer uses;
  * the German stemmer additionally backs the q_fts_stemmed_de oracle gate.
  */
object SnowballStemmer {

  val Languages: Seq[String] =
    Seq("english", "german", "french", "spanish", "italian", "portuguese",
      "dutch", "swedish", "norwegian", "danish", "russian",
      "finnish", "romanian", "hungarian", "turkish", "arabic", "greek",
      "tamil")

  def stem(word: String, language: String): String = language.toLowerCase match {
    case "english" | "en" | "porter" => PorterStemmer.stem(word)
    case "german" | "de" => german(word)
    case "french" | "fr" => french(word)
    case "spanish" | "es" => spanish(word)
    case "italian" | "it" => italian(word)
    case "portuguese" | "pt" => portuguese(word)
    case "dutch" | "nl" => dutch(word)
    case "swedish" | "sv" => swedish(word)
    case "norwegian" | "no" | "nb" => norwegian(word)
    case "danish" | "da" => danish(word)
    case "russian" | "ru" => russian(word)
    case "finnish" | "fi" => finnish(word)
    case "romanian" | "ro" => romanian(word)
    case "hungarian" | "hu" => hungarian(word)
    case "turkish" | "tr" => turkish(word)
    case "arabic" | "ar" => arabic(word)
    case "greek" | "el" => greek(word)
    case "tamil" | "ta" => tamil(word)
    case other => throw new IllegalArgumentException(
      s"unsupported stemmer language '$other' (supported: ${Languages.mkString(", ")})")
  }

  // ---------------------------------------------------------------- shared

  /** Standard R1/R2: R1 = region after the first non-vowel following a
    * vowel; R2 = the same computed inside R1. Returns start offsets. */
  private def regions(s: CharSequence, isVowel: Char => Boolean): (Int, Int) = {
    def after(from: Int): Int = {
      var i = from
      val n = s.length
      while (i < n && !isVowel(s.charAt(i))) i += 1
      while (i < n && isVowel(s.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }
    val r1 = after(0)
    (r1, after(r1))
  }

  // ---------------------------------------------------------------- german

  private val deVowels = "aeiouyäöü".toSet
  private val deSEnding = "bdfghklmnrt".toSet
  private val deStEnding = "bdfghklmnt".toSet

  /** Snowball German. Pipeline: ß→ss; protect u/y between vowels; R1 (≥3) /
    * R2; three suffix steps; unprotect + strip umlauts. */
  def german(word: String): String = {
    if (word.length <= 2) return word.replace("ß", "ss")
    val pre = word.replace("ß", "ss").toCharArray
    // protect u and y between vowels (judged on the unprotected string)
    val orig = pre.clone()
    var i = 1
    while (i < pre.length - 1) {
      if (deVowels(orig(i - 1)) && deVowels(orig(i + 1))) {
        if (pre(i) == 'u') pre(i) = 'U'
        if (pre(i) == 'y') pre(i) = 'Y'
      }
      i += 1
    }
    val b = new StringBuilder(new String(pre))
    val (r1raw, r2) = regions(b, deVowels)
    val r1 = math.max(r1raw, 3) // German adjustment: R1 starts at 3 at least

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)

    // step 1: longest among the groups; matched-but-out-of-region ends the
    // step without deletion (Snowball among semantics, no backtracking)
    locally {
      val s1 = Seq("ern", "em", "er", "en", "es", "e", "s").sortBy(-_.length)
      s1.find(ends) match {
        case Some("s") =>
          val p = sufStart("s")
          if (p >= r1 && p >= 1 && deSEnding(b.charAt(p - 1))) del("s")
        case Some(suf @ ("e" | "en" | "es")) =>
          if (sufStart(suf) >= r1) {
            del(suf)
            // Ergebnisse → Ergebniss → Ergebnis
            if (ends("niss")) b.setLength(b.length - 1)
          }
        case Some(suf) => if (sufStart(suf) >= r1) del(suf)
        case None =>
      }
    }

    // step 2: en/er/est, plus st after a valid st-ending itself ≥3 in
    locally {
      val s2 = Seq("est", "en", "er").sortBy(-_.length)
      s2.find(ends) match {
        case Some(suf) => if (sufStart(suf) >= r1) del(suf)
        case None =>
          if (ends("st")) {
            val p = sufStart("st")
            if (p >= r1 && p >= 4 && deStEnding(b.charAt(p - 1))) del("st")
          }
      }
    }

    // step 3: d-suffixes, longest-match with chained secondary deletions
    locally {
      val cands = Seq("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik")
        .sortBy(-_.length)
      cands.find(ends) match {
        case Some(suf @ ("end" | "ung")) =>
          if (sufStart(suf) >= r2) {
            del(suf)
            if (ends("ig") && sufStart("ig") >= r2 &&
                (sufStart("ig") == 0 || b.charAt(sufStart("ig") - 1) != 'e'))
              del("ig")
          }
        case Some(suf @ ("ig" | "ik" | "isch")) =>
          if (sufStart(suf) >= r2 &&
              (sufStart(suf) == 0 || b.charAt(sufStart(suf) - 1) != 'e'))
            del(suf)
        case Some(suf @ ("lich" | "heit")) =>
          if (sufStart(suf) >= r2) {
            del(suf)
            Seq("er", "en").find(ends).foreach { p =>
              if (sufStart(p) >= r1) del(p)
            }
          }
        case Some("keit") =>
          if (sufStart("keit") >= r2) {
            del("keit")
            Seq("lich", "ig").find(ends).foreach { p =>
              if (sufStart(p) >= r2) del(p)
            }
          }
        case _ =>
      }
    }

    b.toString.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  // ---------------------------------------------------------------- spanish

  private val esVowels = "aeiouáéíóúü".toSet

  /** RV for Spanish (and, structurally, Portuguese-family languages):
    *  - second letter a consonant → after the next following vowel;
    *  - first two letters vowels → after the next consonant;
    *  - else (consonant-vowel) → after the third letter;
    *  - end of word if no such position. */
  private def esRv(s: CharSequence): Int = {
    val n = s.length
    if (n < 3) return n
    def v(i: Int) = esVowels(s.charAt(i))
    if (!v(1)) { // X C : after next vowel following position 1
      var i = 2; while (i < n && !v(i)) i += 1
      if (i < n) i + 1 else n
    } else if (v(0) && v(1)) { // V V : after next consonant
      var i = 2; while (i < n && v(i)) i += 1
      if (i < n) i + 1 else n
    } else 3 // C V
  }

  def spanish(word: String): String = {
    if (word.length <= 2) return unaccentEs(word)
    val b = new StringBuilder(word)
    val rv = esRv(b)
    val (r1, r2) = regions(b, esVowels)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def endsAny(sufs: Seq[String]): Option[String] =
      sufs.sortBy(-_.length).find(ends)

    // step 0: attached pronoun after a gerund/infinitive marker, in RV
    locally {
      val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
        "los", "nos", "me", "se", "la", "le", "lo")
      endsAny(pronouns).foreach { pr =>
        val stemEnd = sufStart(pr)
        val head = b.substring(0, stemEnd)
        val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
        val plain = Seq("ando", "iendo", "ar", "er", "ir")
        def inRv(m: String): Boolean = stemEnd - m.length >= rv
        accented.sortBy(-_.length).find(m => head.endsWith(m) && inRv(m)) match {
          case Some(m) =>
            del(pr)
            val fixed = m.map {
              case 'é' => 'e'; case 'á' => 'a'; case 'í' => 'i'; case c => c }
            b.replace(b.length - m.length, b.length, fixed)
          case None =>
            if (plain.sortBy(-_.length).exists(m => head.endsWith(m) && inRv(m)))
              del(pr)
            else if (head.endsWith("uyendo") && inRv("yendo")) del(pr)
        }
      }
    }

    val lenAfter0 = b.length
    // step 1: standard suffixes
    var step1Removed = false
    locally {
      val delR2 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
        "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
        "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
      val adorGroup = Seq("aciones", "adoras", "adores", "ancias", "adora",
        "ación", "antes", "ancia", "ador", "ante")
      val all = (delR2.map(s => (s, "delR2")) ++ adorGroup.map(s => (s, "ador")) ++
        Seq(("logías", "log"), ("logía", "log"),
          ("uciones", "u"), ("ución", "u"),
          ("encias", "ente"), ("encia", "ente"),
          ("amente", "amente"), ("mente", "mente"),
          ("idades", "idad"), ("idad", "idad"),
          ("ivas", "iv"), ("ivos", "iv"), ("iva", "iv"), ("ivo", "iv")))
        .sortBy(-_._1.length)
      all.find { case (s, _) => ends(s) } match {
        case Some((suf, kind)) =>
          val p = sufStart(suf)
          kind match {
            case "delR2" => if (p >= r2) { del(suf); step1Removed = true }
            case "ador" => if (p >= r2) {
              del(suf); step1Removed = true
              if (ends("ic") && sufStart("ic") >= r2) del("ic")
            }
            case "log" => if (p >= r2) {
              b.replace(p, b.length, "log"); step1Removed = true }
            case "u" => if (p >= r2) {
              b.replace(p, b.length, "u"); step1Removed = true }
            case "ente" => if (p >= r2) {
              b.replace(p, b.length, "ente"); step1Removed = true }
            case "amente" => if (p >= r1) {
              del(suf); step1Removed = true
              if (ends("iv") && sufStart("iv") >= r2) {
                del("iv")
                if (ends("at") && sufStart("at") >= r2) del("at")
              } else Seq("os", "ic", "ad").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "mente" => if (p >= r2) {
              del(suf); step1Removed = true
              Seq("ante", "able", "ible").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "idad" => if (p >= r2) {
              del(suf); step1Removed = true
              Seq("abil", "ic", "iv").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "iv" => if (p >= r2) {
              del(suf); step1Removed = true
              if (ends("at") && sufStart("at") >= r2) del("at")
            }
          }
        case None =>
      }
    }

    // step 2a: y-verb endings (only if step 1 removed nothing)
    var step2aRemoved = false
    if (!step1Removed && b.length == lenAfter0) {
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
        "yes", "ya", "ye", "yo", "yó")
      endsAny(ys).foreach { suf =>
        val p = sufStart(suf)
        if (p >= rv && p >= 1 && b.charAt(p - 1) == 'u') {
          del(suf); step2aRemoved = true
        }
      }
    }

    // step 2b: other verb endings
    if (!step1Removed && !step2aRemoved && b.length == lenAfter0) {
      val guGroup = Seq("emos", "éis", "en", "es")
      val plain = Seq("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
        "aríais", "aseis", "eríais", "iríais", "ierais", "ieseis", "asteis",
        "isteis", "ábamos", "áramos", "ásemos", "arían", "arías", "aréis",
        "erían", "erías", "eréis", "irían", "irías", "iréis", "ieran",
        "iesen", "ieron", "iendo", "ieras", "ieses", "abais", "arais",
        "aseis", "íamos", "arán", "arás", "aría", "erán", "erás", "ería",
        "irán", "irás", "iría", "iera", "iese", "aste", "iste", "aban",
        "aran", "asen", "aron", "ando", "abas", "adas", "idas", "aras",
        "ases", "íais", "ados", "idos", "amos", "imos", "ará", "aré",
        "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara", "ase",
        "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id", "an",
        "ió", "ar", "er", "ir", "as", "ís", "é", "í", "ó")
      val all = (guGroup.map(s => (s, true)) ++ plain.map(s => (s, false)))
        .sortBy(-_._1.length)
      all.find { case (s, _) => ends(s) } match {
        case Some((suf, isGu)) =>
          val p = sufStart(suf)
          if (p >= rv) {
            del(suf)
            // for en/es/éis/emos: a preceding gu loses its u (u need not be in RV)
            if (isGu && ends("gu")) b.setLength(b.length - 1)
          }
        case None =>
      }
    }

    // step 3: residual suffix
    locally {
      val strong = Seq("os", "a", "o", "á", "í", "ó")
      val eGroup = Seq("e", "é")
      endsAny(strong ++ eGroup).foreach { suf =>
        val p = sufStart(suf)
        if (p >= rv) {
          val isE = eGroup.contains(suf)
          del(suf)
          if (isE && ends("gu") && sufStart("u") >= rv) b.setLength(b.length - 1)
        }
      }
    }

    unaccentEs(b.toString)
  }

  private def unaccentEs(s: String): String = s.map {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case c => c
  }

  // ---------------------------------------------------------------- french

  private val frVowels = "aeiouyâàëéêèïîôûù".toSet

  def french(word: String): String = {
    if (word.length <= 2) return word
    // prelude: protect u/i between vowels, y next to a vowel, u after q
    val cs = word.toCharArray
    val orig = cs.clone()
    def v(i: Int) = i >= 0 && i < orig.length && frVowels(orig(i))
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case 'u' if i > 0 && orig(i - 1) == 'q' => cs(i) = 'U'
        case 'u' if v(i - 1) && v(i + 1) => cs(i) = 'U'
        case 'i' if v(i - 1) && v(i + 1) => cs(i) = 'I'
        case 'y' if v(i - 1) || v(i + 1) => cs(i) = 'Y'
        case _ =>
      }
      i += 1
    }
    val b = new StringBuilder(new String(cs))

    def isV(c: Char) = frVowels(c)
    val rv: Int = {
      val n = b.length
      if (n > 3 && (b.substring(0, 3) == "par" || b.substring(0, 3) == "col" ||
          b.substring(0, 3) == "tap")) 3
      else if (n >= 3 && isV(b.charAt(0)) && isV(b.charAt(1))) 3
      else {
        var j = 1; while (j < n && !isV(b.charAt(j))) j += 1
        if (j < n) j + 1 else n
      }
    }
    val (r1, r2) = regions(b, isV)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def endsAny(sufs: Seq[String]): Option[String] =
      sufs.sortBy(-_.length).find(ends)

    val len0 = b.length
    var mentFound = false

    // ---- step 1: standard suffixes (longest match governs)
    locally {
      val delR2 = Seq("ances", "iqUes", "ismes", "ables", "istes", "ance",
        "iqUe", "isme", "able", "iste", "eux")
      val ateurGroup = Seq("atrices", "atrice", "ateurs", "ations", "ateur",
        "ation")
      val table: Seq[(String, String)] =
        (delR2.map((_, "delR2")) ++ ateurGroup.map((_, "ateur")) ++ Seq(
          ("logies", "log"), ("logie", "log"),
          ("usions", "u"), ("utions", "u"), ("usion", "u"), ("ution", "u"),
          ("ences", "ent"), ("ence", "ent"),
          ("issements", "issement"), ("issement", "issement"),
          ("ements", "ement"), ("ement", "ement"),
          ("ités", "ité"), ("ité", "ité"),
          ("ives", "if"), ("ifs", "if"), ("ive", "if"), ("if", "if"),
          ("eaux", "eaux"), ("aux", "aux"),
          ("euses", "euse"), ("euse", "euse"),
          ("amment", "amment"), ("emment", "emment"),
          ("ments", "ment"), ("ment", "ment")))
      table.sortBy(-_._1.length).find { case (s, _) => ends(s) } match {
        case Some((suf, kind)) =>
          val p = sufStart(suf)
          kind match {
            case "delR2" => if (p >= r2) del(suf)
            case "ateur" => if (p >= r2) {
              del(suf)
              if (ends("ic")) {
                if (sufStart("ic") >= r2) del("ic")
                else b.replace(sufStart("ic"), b.length, "iqU")
              }
            }
            case "log" => if (p >= r2) b.replace(p, b.length, "log")
            case "u" => if (p >= r2) b.replace(p, b.length, "u")
            case "ent" => if (p >= r2) b.replace(p, b.length, "ent")
            case "issement" =>
              if (p >= r1 && p >= 1 && !isV(b.charAt(p - 1))) del(suf)
            case "ement" =>
              if (p >= rv) {
                del(suf)
                if (ends("iv") && sufStart("iv") >= r2) {
                  del("iv")
                  if (ends("at") && sufStart("at") >= r2) del("at")
                } else if (ends("eus")) {
                  if (sufStart("eus") >= r2) del("eus")
                  else if (sufStart("eus") >= r1)
                    b.replace(sufStart("eus"), b.length, "eux")
                } else if (ends("abl") && sufStart("abl") >= r2) del("abl")
                else if (ends("iqU") && sufStart("iqU") >= r2) del("iqU")
                else if (ends("ièr") && sufStart("ièr") >= rv)
                  b.replace(sufStart("ièr"), b.length, "i")
                else if (ends("Ièr") && sufStart("Ièr") >= rv)
                  b.replace(sufStart("Ièr"), b.length, "i")
              }
            case "ité" =>
              if (p >= r2) {
                del(suf)
                if (ends("abil")) {
                  if (sufStart("abil") >= r2) del("abil")
                  else b.replace(sufStart("abil"), b.length, "abl")
                } else if (ends("ic")) {
                  if (sufStart("ic") >= r2) del("ic")
                  else b.replace(sufStart("ic"), b.length, "iqU")
                } else if (ends("iv") && sufStart("iv") >= r2) del("iv")
              }
            case "if" =>
              if (p >= r2) {
                del(suf)
                if (ends("at") && sufStart("at") >= r2) {
                  del("at")
                  if (ends("ic")) {
                    if (sufStart("ic") >= r2) del("ic")
                    else b.replace(sufStart("ic"), b.length, "iqU")
                  }
                }
              }
            case "eaux" => b.replace(p, b.length, "eau")
            case "aux" => if (p >= r1) b.replace(p, b.length, "al")
            case "euse" =>
              if (p >= r2) del(suf)
              else if (p >= r1) b.replace(p, b.length, "eux")
            case "amment" =>
              if (p >= rv) { b.replace(p, b.length, "ant"); mentFound = true }
            case "emment" =>
              if (p >= rv) { b.replace(p, b.length, "ent"); mentFound = true }
            case "ment" =>
              mentFound = true
              if (p >= rv && p >= 1 && isV(b.charAt(p - 1)) && p - 1 >= rv)
                del(suf)
          }
        case None =>
      }
    }

    val step1Changed = b.length != len0 || b.toString != new String(cs)
    val do2a = !step1Changed || mentFound
    var tried2a = false
    var removed2 = false

    if (do2a) {
      tried2a = true
      val i2a = Seq("issaIent", "issantes", "iraIent", "issante", "issants",
        "issions", "irions", "issais", "issait", "issant", "issent",
        "issiez", "issons", "irais", "irait", "irent", "iriez", "irons",
        "iront", "isses", "issez", "îmes", "îtes", "irai", "iras", "irez",
        "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
      i2a.sortBy(-_.length).find(ends) match {
        case Some(suf) =>
          val p = sufStart(suf)
          if (p >= rv && p >= 1 && !isV(b.charAt(p - 1)) && p - 1 >= rv) {
            del(suf); removed2 = true
          }
        case None =>
      }
      if (!removed2) {
        // step 2b
        val ionsGroup = Seq("ions")
        val eGroup = Seq("eraIent", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "ées", "era",
          "iez", "ée", "és", "er", "ez", "é")
        val aGroup = Seq("assions", "assent", "assiez", "aIent", "antes",
          "asses", "âtes", "ante", "ants", "asse", "âmes", "ais", "ait",
          "ant", "ât", "ai", "as", "a")
        val all = (ionsGroup.map((_, "ions")) ++ eGroup.map((_, "e")) ++
          aGroup.map((_, "a"))).sortBy(-_._1.length)
        all.find { case (s, _) => ends(s) } match {
          case Some((suf, kind)) =>
            val p = sufStart(suf)
            kind match {
              case "ions" => if (p >= r2) { del(suf); removed2 = true }
              case "e" => if (p >= rv) { del(suf); removed2 = true }
              case "a" => if (p >= rv) {
                del(suf); removed2 = true
                if (ends("e") && sufStart("e") >= rv) del("e")
              }
            }
          case None =>
        }
      }
    }

    val altered = step1Changed || removed2
    if (altered) {
      // step 3
      if (b.nonEmpty && b.charAt(b.length - 1) == 'Y')
        b.setCharAt(b.length - 1, 'i')
      else if (b.nonEmpty && b.charAt(b.length - 1) == 'ç')
        b.setCharAt(b.length - 1, 'c')
    } else {
      // step 4
      if (b.nonEmpty && b.charAt(b.length - 1) == 's') {
        val prev = if (b.length >= 2) b.charAt(b.length - 2) else ' '
        if (!"aiouès".contains(prev)) b.setLength(b.length - 1)
      }
      val s4 = Seq(("Ière", "i"), ("ière", "i"), ("Ier", "i"), ("ier", "i"),
        ("ion", ""), ("e", ""))
      s4.sortBy(-_._1.length).find { case (s, _) => ends(s) } match {
        case Some(("ion", _)) =>
          val p = sufStart("ion")
          if (p >= r2 && p >= 1 && (b.charAt(p - 1) == 's' || b.charAt(p - 1) == 't'))
            del("ion")
        case Some((suf @ ("ier" | "ière" | "Ier" | "Ière"), _)) =>
          if (sufStart(suf) >= rv) b.replace(sufStart(suf), b.length, "i")
        case Some(("e", _)) =>
          if (sufStart("e") >= rv) del("e")
        case _ =>
      }
    }

    // step 5: undouble
    Seq("enn", "onn", "ett", "ell", "eill").foreach { d =>
      if (ends(d)) b.setLength(b.length - 1)
    }
    // step 6: un-accent a final é/è + non-vowel run
    locally {
      var j = b.length - 1
      while (j >= 0 && !isV(b.charAt(j)) && !"éè".contains(b.charAt(j))) j -= 1
      if (j >= 0 && j < b.length - 1 && (b.charAt(j) == 'é' || b.charAt(j) == 'è'))
        b.setCharAt(j, 'e')
    }
    b.toString.map { case 'U' => 'u'; case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  // ----------------------------------------------------------------- dutch

  private val nlVowels = "aeiouyè".toSet

  def dutch(word0: String): String = {
    if (word0.length <= 2) return word0
    // prelude: strip umlauts/acutes, then protect initial y, y after a
    // vowel, and i between vowels
    val word = word0.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    val cs = word.toCharArray
    val orig = cs.clone()
    def v(i: Int) = i >= 0 && i < orig.length && nlVowels(orig(i))
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case 'y' if i == 0 || v(i - 1) => cs(i) = 'Y'
        case 'i' if v(i - 1) && v(i + 1) => cs(i) = 'I'
        case _ =>
      }
      i += 1
    }
    val b = new StringBuilder(new String(cs))
    def isV(c: Char) = nlVowels(c)
    val (r1raw, r2) = regions(b, isV)
    val r1 = math.max(r1raw, 3)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def undouble(): Unit =
      if (ends("kk") || ends("dd") || ends("tt")) b.setLength(b.length - 1)
    // valid en-ending: a non-vowel, and the stem must not end in "gem"
    def enOk(stemEnd: Int): Boolean =
      stemEnd >= 1 && !isV(b.charAt(stemEnd - 1)) &&
        !(stemEnd >= 3 && b.substring(stemEnd - 3, stemEnd) == "gem")
    def delEn(suf: String): Boolean = {
      val p = sufStart(suf)
      if (p >= r1 && enOk(p)) { del(suf); undouble(); true } else false
    }

    // step 1
    if (ends("heden")) {
      if (sufStart("heden") >= r1)
        b.replace(sufStart("heden"), b.length, "heid")
    } else if (ends("ene")) delEn("ene")
    else if (ends("en")) delEn("en")
    else if (ends("se") || ends("s")) {
      val suf = if (ends("se")) "se" else "s"
      val p = sufStart(suf)
      // valid s-ending: a non-vowel other than j
      if (p >= r1 && p >= 1 && !isV(b.charAt(p - 1)) && b.charAt(p - 1) != 'j')
        del(suf)
    }

    // step 2: final e after a non-vowel, then undouble (the removal feeds
    // step 3b's "bar" condition)
    var eRemoved = false
    if (ends("e") && sufStart("e") >= r1 && b.length >= 2 &&
        !isV(b.charAt(b.length - 2))) {
      del("e"); undouble(); eRemoved = true
    }

    // step 3a: heid (not after c), then a directly-preceding en as step 1
    if (ends("heid") && sufStart("heid") >= r2 &&
        (sufStart("heid") == 0 || b.charAt(sufStart("heid") - 1) != 'c')) {
      del("heid")
      if (ends("en")) delEn("en")
    }

    // step 3b: d-suffixes
    locally {
      val cands = Seq("lijk", "baar", "end", "ing", "bar", "ig").sortBy(-_.length)
      cands.find(ends) match {
        case Some(suf @ ("end" | "ing")) =>
          if (sufStart(suf) >= r2) {
            del(suf)
            if (ends("ig") && sufStart("ig") >= r2 &&
                (sufStart("ig") == 0 || b.charAt(sufStart("ig") - 1) != 'e'))
              del("ig")
            else undouble()
          }
        case Some("ig") =>
          if (sufStart("ig") >= r2 &&
              (sufStart("ig") == 0 || b.charAt(sufStart("ig") - 1) != 'e'))
            del("ig")
        case Some("lijk") =>
          if (sufStart("lijk") >= r2) {
            del("lijk")
            // repeat step 2
            if (ends("e") && sufStart("e") >= r1 && b.length >= 2 &&
                !isV(b.charAt(b.length - 2))) { del("e"); undouble() }
          }
        case Some("baar") => if (sufStart("baar") >= r2) del("baar")
        case Some("bar") => if (sufStart("bar") >= r2 && eRemoved) del("bar")
        case _ =>
      }
    }

    // step 4: undouble vowel — c + aa/ee/oo/uu + c (final c not I/j per the
    // protected-letter rule) loses one vowel
    if (b.length >= 4) {
      val n = b.length
      val c2 = b.charAt(n - 1); val v1 = b.charAt(n - 2)
      val v0 = b.charAt(n - 3); val c1 = b.charAt(n - 4)
      if (!isV(c1) && !isV(c2) && c2 != 'I' && v0 == v1 && "aeou".contains(v0))
        b.deleteCharAt(n - 2)
    }

    b.toString.map { case 'Y' => 'y'; case 'I' => 'i'; case c => c }
  }

  // ------------------------------------------------------- scandinavian trio
  // Swedish / Norwegian / Danish share the simple Snowball shape: R1 (start
  // forced to ≥3), one big delete-if-in-R1 suffix step with an s-ending
  // condition, a consonant-cluster trim, and a small d-suffix step.

  private def r1Min3(s: CharSequence, isVowel: Char => Boolean): Int = {
    val (r1, _) = regions(s, isVowel)
    math.max(r1, 3)
  }

  private val svVowels = "aeiouyäåö".toSet
  private val svSEnding = "bcdfghjklmnoprtvy".toSet

  def swedish(word: String): String = {
    if (word.length <= 3) return word
    val b = new StringBuilder(word)
    val r1 = r1Min3(b, svVowels)
    def ends(suf: String) =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String) = b.length - suf.length
    // step 1 (a-suffixes + conditional s)
    val s1 = Seq("heterna", "hetens", "anden", "heten", "heter", "arnas",
      "ernas", "ornas", "arens", "andes", "andet", "arna", "erna", "orna",
      "ande", "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern",
      "ens", "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at",
      "a", "e")
    s1.sortBy(-_.length).find(ends) match {
      case Some(suf) => if (sufStart(suf) >= r1) b.setLength(b.length - suf.length)
      case None =>
        if (ends("s") && sufStart("s") >= r1 && b.length >= 2 &&
            svSEnding(b.charAt(b.length - 2)))
          b.setLength(b.length - 1)
    }
    // step 2: trim a consonant cluster's last letter
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")
        .exists(c => ends(c) && sufStart(c) >= r1))
      b.setLength(b.length - 1)
    // step 3: d-suffixes
    if (ends("fullt") && sufStart("fullt") >= r1) b.setLength(b.length - 1)
    else if (ends("löst") && sufStart("löst") >= r1) b.setLength(b.length - 1)
    else Seq("lig", "els", "ig").sortBy(-_.length)
      .find(s => ends(s) && sufStart(s) >= r1)
      .foreach(s => b.setLength(b.length - s.length))
    b.toString
  }

  private val noVowels = "aeiouyæåø".toSet
  private val noSEnding = "bcdfghjlmnoprtvyz".toSet

  def norwegian(word: String): String = {
    if (word.length <= 3) return word
    val b = new StringBuilder(word)
    val r1 = r1Min3(b, noVowels)
    def ends(suf: String) =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String) = b.length - suf.length
    // step 1: delete group, erte/ert → er, conditional s (k counts as a
    // valid s-ending only when not preceded by a vowel)
    val del = Seq("hetenes", "hetene", "hetens", "heter", "heten", "endes",
      "ande", "ende", "edes", "enes", "eres", "ets", "het", "ast", "ens",
      "ers", "ede", "ane", "ene", "et", "es", "as", "en", "ar", "er",
      "e", "a")
    val all = (del.map((_, "del")) ++ Seq(("erte", "er"), ("ert", "er")))
      .sortBy(-_._1.length)
    all.find { case (s, _) => ends(s) } match {
      case Some((suf, "del")) =>
        if (sufStart(suf) >= r1) b.setLength(b.length - suf.length)
      case Some((suf, _)) =>
        if (sufStart(suf) >= r1) b.replace(sufStart(suf), b.length, "er")
      case None =>
        if (ends("s") && sufStart("s") >= r1 && b.length >= 2) {
          val prev = b.charAt(b.length - 2)
          val ok = noSEnding(prev) ||
            (prev == 'k' && (b.length < 3 || !noVowels(b.charAt(b.length - 3))))
          if (ok) b.setLength(b.length - 1)
        }
    }
    // step 2: dt/vt → drop the t
    if (Seq("dt", "vt").exists(c => ends(c) && sufStart(c) >= r1))
      b.setLength(b.length - 1)
    // step 3: d-suffixes
    Seq("hetslov", "eleg", "elov", "slov", "elig", "lov", "leg", "eig",
      "lig", "els", "ig").sortBy(-_.length)
      .find(s => ends(s) && sufStart(s) >= r1)
      .foreach(s => b.setLength(b.length - s.length))
    b.toString
  }

  private val daVowels = "aeiouyæåø".toSet
  private val daSEnding = "abcdfghjklmnoprtvyzå".toSet

  def danish(word: String): String = {
    if (word.length <= 3) return word
    val b = new StringBuilder(word)
    val r1 = r1Min3(b, daVowels)
    def ends(suf: String) =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String) = b.length - suf.length
    // step 1
    val s1 = Seq("erendes", "erende", "hedens", "ethed", "erede", "heden",
      "heder", "endes", "erens", "erets", "enes", "eren", "erer", "eres",
      "ende", "erne", "ered", "heds", "ene", "ens", "ers", "ets", "hed",
      "es", "et", "er", "en", "e")
    s1.sortBy(-_.length).find(ends) match {
      case Some(suf) => if (sufStart(suf) >= r1) b.setLength(b.length - suf.length)
      case None =>
        if (ends("s") && sufStart("s") >= r1 && b.length >= 2 &&
            daSEnding(b.charAt(b.length - 2)))
          b.setLength(b.length - 1)
    }
    // step 2: trim gd/dt/gt/kt
    def step2(): Unit =
      if (Seq("gd", "dt", "gt", "kt").exists(c => ends(c) && sufStart(c) >= r1))
        b.setLength(b.length - 1)
    step2()
    // step 3: igst → drop st; then d-suffixes (delete + re-run step 2);
    // løst → løs
    if (ends("igst")) b.setLength(b.length - 2)
    if (ends("løst") && sufStart("løst") >= r1) b.setLength(b.length - 1)
    else Seq("elig", "lig", "els", "ig").sortBy(-_.length)
      .find(s => ends(s) && sufStart(s) >= r1)
      .foreach { s => b.setLength(b.length - s.length); step2() }
    // step 4: undouble a final double consonant in R1
    if (b.length >= 2 && b.charAt(b.length - 1) == b.charAt(b.length - 2) &&
        !daVowels(b.charAt(b.length - 1)) && b.length - 1 >= r1)
      b.setLength(b.length - 1)
    b.toString
  }

  // ---------------------------------------------------------------- italian

  private val itVowels = "aeiouàèìòù".toSet

  def italian(word0: String): String = {
    if (word0.length <= 2) return word0
    // prelude: acute → grave accents; protect u after q and u/i between
    // vowels as U/I
    val word = word0.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }
    val cs = word.toCharArray
    val orig = cs.clone()
    def v(i: Int) = i >= 0 && i < orig.length && itVowels(orig(i))
    var i = 0
    while (i < cs.length) {
      cs(i) match {
        case 'u' if i > 0 && orig(i - 1) == 'q' => cs(i) = 'U'
        case 'u' if v(i - 1) && v(i + 1) => cs(i) = 'U'
        case 'i' if v(i - 1) && v(i + 1) => cs(i) = 'I'
        case _ =>
      }
      i += 1
    }
    val b = new StringBuilder(new String(cs))
    def isV(c: Char) = itVowels(c)
    val rv = esStyleRv(b, isV)
    val (r1, r2) = regions(b, isV)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def endsAny(sufs: Seq[String]): Option[String] =
      sufs.sortBy(-_.length).find(ends)

    // step 0: attached pronoun after a gerund/infinitive marker in RV;
    // gerund (ando/endo) → delete, infinitive (ar/er/ir) → replace with e
    locally {
      val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
        "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
        "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
        "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
        "li", "lo", "mi", "ne", "si", "ti", "vi")
      endsAny(pronouns).foreach { pr =>
        val stemEnd = sufStart(pr)
        val head = b.substring(0, stemEnd)
        def inRv(m: String) = stemEnd - m.length >= rv
        if (Seq("ando", "endo").exists(m => head.endsWith(m) && inRv(m)))
          del(pr)
        else if (Seq("ar", "er", "ir").exists(m => head.endsWith(m) && inRv(m)))
          b.replace(stemEnd, b.length, "e")
      }
    }

    val len0 = b.length
    // step 1: standard suffixes
    var step1Removed = false
    locally {
      val delR2 = Seq("abile", "abili", "ibile", "ibili", "atrice", "atrici",
        "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista",
        "iste", "isti", "istà", "istè", "istì", "ante", "anti", "ico",
        "ici", "ica", "ice", "oso", "osi", "osa", "ose")
      val table: Seq[(String, String)] =
        (delR2.map((_, "delR2")) ++ Seq(
          ("azione", "azione"), ("azioni", "azione"), ("atore", "azione"),
          ("atori", "azione"),
          ("logia", "log"), ("logie", "log"),
          ("uzione", "u"), ("uzioni", "u"), ("usione", "u"), ("usioni", "u"),
          ("enza", "ente"), ("enze", "ente"),
          ("amento", "rv"), ("amenti", "rv"), ("imento", "rv"), ("imenti", "rv"),
          ("amente", "amente"),
          ("ità", "ità"),
          ("ivo", "iv"), ("ivi", "iv"), ("iva", "iv"), ("ive", "iv")))
      table.sortBy(-_._1.length).find { case (suf, _) => ends(suf) } match {
        case Some((suf, kind)) =>
          val p = sufStart(suf)
          kind match {
            case "delR2" => if (p >= r2) { del(suf); step1Removed = true }
            case "azione" => if (p >= r2) {
              del(suf); step1Removed = true
              if (ends("ic") && sufStart("ic") >= r2) del("ic")
            }
            case "log" => if (p >= r2) { b.replace(p, b.length, "log"); step1Removed = true }
            case "u" => if (p >= r2) { b.replace(p, b.length, "u"); step1Removed = true }
            case "ente" => if (p >= r2) { b.replace(p, b.length, "ente"); step1Removed = true }
            case "rv" => if (p >= rv) { del(suf); step1Removed = true }
            case "amente" => if (p >= r1) {
              del(suf); step1Removed = true
              if (ends("iv") && sufStart("iv") >= r2) {
                del("iv")
                if (ends("at") && sufStart("at") >= r2) del("at")
              } else Seq("os", "ic", "abil").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "ità" => if (p >= r2) {
              del(suf); step1Removed = true
              Seq("abil", "ic", "iv").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "iv" => if (p >= r2) {
              del(suf); step1Removed = true
              if (ends("at") && sufStart("at") >= r2) {
                del("at")
                if (ends("ic") && sufStart("ic") >= r2) del("ic")
              }
            }
          }
        case None =>
      }
    }

    // step 2: verb suffixes, only if step 1 removed nothing
    if (!step1Removed && b.length == len0) {
      val verbs = Seq("erebbero", "irebbero", "assero", "assimo", "eranno",
        "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno",
        "irebbe", "iremmo", "ireste", "iresti", "iscano", "iscono",
        "issero", "arono", "avamo", "avano", "avate", "eremo", "erete",
        "erono", "evamo", "evano", "evate", "iremo", "irete", "irono",
        "ivamo", "ivano", "ivate", "ammo", "ando", "asse", "assi",
        "emmo", "enda", "ende", "endi", "endo", "erai", "erei", "Yamo",
        "iamo", "immo", "irai", "irei", "isca", "isce", "isci", "isco",
        "ano", "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo",
        "erà", "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire",
        "irò", "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono",
        "uta", "ute", "uti", "uto", "ar", "ir")
      endsAny(verbs).foreach { suf =>
        if (sufStart(suf) >= rv) del(suf)
      }
    }

    // step 3a: a final vowel in RV, then a preceding i in RV
    locally {
      val last = if (b.nonEmpty) b.charAt(b.length - 1) else ' '
      if ("aeioàèìò".contains(last) && b.length - 1 >= rv) {
        b.setLength(b.length - 1)
        if (b.nonEmpty && b.charAt(b.length - 1) == 'i' && b.length - 1 >= rv)
          b.setLength(b.length - 1)
      }
    }
    // step 3b: final ch/gh → c/g in RV
    if ((ends("ch") || ends("gh")) && sufStart("ch") >= rv)
      b.setLength(b.length - 1)

    b.toString.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }

  // -------------------------------------------------------------- portuguese

  private val ptVowels = "aeiouáéíóúâêô".toSet

  def portuguese(word0: String): String = {
    if (word0.length <= 2) return word0
    // prelude: nasal vowels to two-char forms so they act as non-vowels
    // mid-algorithm; postlude restores them
    val b = new StringBuilder(word0.replace("ã", "a~").replace("õ", "o~"))
    def isV(c: Char) = ptVowels(c)
    val rv = esStyleRv(b, isV)
    val (r1, r2) = regions(b, isV)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)

    val len0 = b.length
    var removed = false
    // ---- step 1: standard suffixes
    locally {
      val delR2 = Seq("amentos", "imentos", "amento", "imento", "adoras",
        "adores", "aço~es", "ismos", "istas", "ância", "eza", "ezas",
        "icos", "icas", "ico", "ica", "ismo", "ável", "ível", "ista",
        "osos", "osas", "oso", "osa", "adora", "ador", "aça~o", "antes",
        "ante")
      val table: Seq[(String, String)] =
        (delR2.map((_, "delR2")) ++ Seq(
          ("logias", "log"), ("logia", "log"),
          ("uço~es", "u"), ("uça~o", "u"),
          ("ências", "ente"), ("ência", "ente"),
          ("amente", "amente"), ("mente", "mente"),
          ("idades", "idade"), ("idade", "idade"),
          ("ivas", "iv"), ("ivos", "iv"), ("iva", "iv"), ("ivo", "iv"),
          ("iras", "ira"), ("ira", "ira")))
      table.sortBy(-_._1.length).find { case (suf, _) => ends(suf) } match {
        case Some((suf, kind)) =>
          val p = sufStart(suf)
          kind match {
            case "delR2" => if (p >= r2) { del(suf); removed = true }
            case "log" => if (p >= r2) { b.replace(p, b.length, "log"); removed = true }
            case "u" => if (p >= r2) { b.replace(p, b.length, "u"); removed = true }
            case "ente" => if (p >= r2) { b.replace(p, b.length, "ente"); removed = true }
            case "amente" => if (p >= r1) {
              del(suf); removed = true
              if (ends("iv") && sufStart("iv") >= r2) {
                del("iv")
                if (ends("at") && sufStart("at") >= r2) del("at")
              } else Seq("os", "ic", "ad").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "mente" => if (p >= r2) {
              del(suf); removed = true
              Seq("ante", "avel", "ível").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "idade" => if (p >= r2) {
              del(suf); removed = true
              Seq("abil", "ic", "iv").find(ends).foreach { x =>
                if (sufStart(x) >= r2) del(x)
              }
            }
            case "iv" => if (p >= r2) {
              del(suf); removed = true
              if (ends("at") && sufStart("at") >= r2) del("at")
            }
            case "ira" =>
              // ira/iras → ir when in RV and preceded by e (pereira family)
              if (p >= rv && p >= 1 && b.charAt(p - 1) == 'e') {
                b.replace(p, b.length, "ir"); removed = true
              }
          }
        case None =>
      }
    }

    // ---- step 2: verb suffixes (only if step 1 removed nothing)
    if (!removed && b.length == len0) {
      val verbs = Seq("aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
        "íssemos", "aríeis", "eríeis", "iríeis", "ásseis", "ésseis",
        "ísseis", "áramos", "éramos", "íramos", "ávamos", "aremos",
        "eremos", "iremos", "ariam", "eriam", "iriam", "assem", "essem",
        "issem", "ara~o", "era~o", "ira~o", "arias", "erias", "irias",
        "ardes", "erdes", "irdes", "asses", "esses", "isses", "astes",
        "estes", "istes", "áreis", "areis", "éreis", "ereis", "íreis",
        "ireis", "ásteis", "ésteis", "ísteis", "íamos", "armos", "ermos",
        "irmos", "aria", "eria", "iria", "asse", "esse", "isse", "aste",
        "este", "iste", "arei", "erei", "irei", "aram", "eram", "iram",
        "avam", "arem", "erem", "irem", "ando", "endo", "indo", "adas",
        "idas", "arás", "aras", "erás", "eras", "irás", "avas", "ares",
        "eres", "ires", "íeis", "ados", "idos", "ámos", "amos", "emos",
        "imos", "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá",
        "ava", "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ia",
        "ei", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu", "iu",
        "ou")
      verbs.sortBy(-_.length).find(ends).foreach { suf =>
        if (sufStart(suf) >= rv) { del(suf); removed = true }
      }
    }

    // ---- step 3: delete i after c, if a suffix was removed
    if (removed && ends("i") && sufStart("i") >= rv &&
        b.length >= 2 && b.charAt(b.length - 2) == 'c')
      b.setLength(b.length - 1)

    // ---- step 4: residual suffix (only if steps 1 and 2 removed nothing)
    if (!removed) {
      Seq("os", "a", "i", "o", "á", "í", "ó").sortBy(-_.length).find(ends)
        .foreach { suf => if (sufStart(suf) >= rv) del(suf) }
    }

    // ---- step 5: final e/é/ê; gu/ci undouble; ç → c
    locally {
      val last = if (b.nonEmpty) b.charAt(b.length - 1) else ' '
      if ("eéê".contains(last) && b.length - 1 >= rv) {
        b.setLength(b.length - 1)
        if ((ends("gu") || ends("ci")) && b.length - 1 >= rv)
          b.setLength(b.length - 1)
      }
      if (b.nonEmpty && b.charAt(b.length - 1) == 'ç')
        b.setCharAt(b.length - 1, 'c')
    }

    b.toString.replace("a~", "ã").replace("o~", "õ")
  }

  /** RV per the Spanish-family definition, parameterized by vowel set. */
  private def esStyleRv(s: CharSequence, isV: Char => Boolean): Int = {
    val n = s.length
    if (n < 3) return n
    if (!isV(s.charAt(1))) {
      var i = 2; while (i < n && !isV(s.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else if (isV(s.charAt(0)) && isV(s.charAt(1))) {
      var i = 2; while (i < n && isV(s.charAt(i))) i += 1
      if (i < n) i + 1 else n
    } else 3
  }

  // --------------------------------------------------------------- romanian

  private val roVowels = "aăâeiîou".toSet

  /** Snowball Romanian (snowballstem.org/algorithms/romanian/stemmer.html).
    * Comma-below forms ș/ț normalize to the cedilla forms ş/ţ the algorithm
    * is defined over. Steps: prelude (protect i/u between vowels), step 0
    * (plural/article removal), step 1 (combining-suffix reduction, looped),
    * step 2 (standard suffixes in R2), step 3 (verb suffixes in RV, only if
    * steps 1–2 removed nothing), step 4 (final vowel in RV). */
  def romanian(word0: String): String = {
    val word = word0.map { case 'ș' => 'ş'; case 'ț' => 'ţ'; case c => c }
    if (word.length <= 2) return word
    val cs = word.toCharArray
    val orig = cs.clone()
    def v(i: Int) = i >= 0 && i < orig.length && roVowels(orig(i))
    var i = 1
    while (i < cs.length - 1) {
      if (v(i - 1) && v(i + 1)) {
        if (cs(i) == 'i') cs(i) = 'I'
        if (cs(i) == 'u') cs(i) = 'U'
      }
      i += 1
    }
    val b = new StringBuilder(new String(cs))
    def isV(c: Char) = roVowels(c)
    val rv = esStyleRv(b, isV)
    val (r1, r2) = regions(b, isV)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def rep(suf: String, to: String): Unit =
      b.replace(sufStart(suf), b.length, to)

    // step 0: removal of plurals / articles, in R1
    locally {
      val table: Seq[(String, String)] = Seq(
        ("ul", ""), ("ului", ""),
        ("aua", "a"),
        ("ea", "e"), ("ele", "e"), ("elor", "e"),
        ("ii", "i"), ("iua", "i"), ("iei", "i"), ("iile", "i"),
        ("iilor", "i"), ("ilor", "i"),
        ("ile", "i"),
        ("atei", "at"),
        ("aţie", "aţi"), ("aţia", "aţi"))
      table.sortBy(-_._1.length).find { case (s, _) => ends(s) } match {
        case Some((suf, to)) =>
          val p = sufStart(suf)
          val ileBlocked = suf == "ile" && p >= 2 &&
            b.substring(p - 2, p) == "ab" // 'ile' not after ab (abile stays)
          if (p >= r1 && !ileBlocked) {
            if (to.isEmpty) del(suf) else rep(suf, to)
          }
        case None =>
      }
    }

    // step 1: reduction of combining suffixes, in R1, repeated to fixpoint
    var step1or2Removed = false
    var continue1 = true
    while (continue1) {
      continue1 = false
      val table: Seq[(String, String)] = Seq(
        ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
        ("abilităţi", "abil"),
        ("ibilitate", "ibil"),
        ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
        ("ivităţi", "iv"),
        ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
        ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
        ("iciv", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
        ("ical", "ic"), ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
        ("ativ", "at"), ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
        ("aţiune", "at"),
        ("atoare", "at"), ("ator", "at"), ("atori", "at"),
        ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
        ("itiv", "it"), ("itive", "it"), ("itivi", "it"), ("itivă", "it"),
        ("iţiune", "it"),
        ("itoare", "it"), ("itor", "it"), ("itori", "it"))
      table.sortBy(-_._1.length).find { case (s, _) => ends(s) } match {
        case Some((suf, to)) if sufStart(suf) >= r1 =>
          rep(suf, to); step1or2Removed = true; continue1 = true
        case _ =>
      }
    }

    // step 2: removal of standard suffixes, in R2
    locally {
      val delPlain = Seq("at", "ata", "ată", "ati", "ate",
        "ut", "uta", "ută", "uti", "ute",
        "it", "ita", "ită", "iti", "ite",
        "ic", "ica", "ice", "ici", "ică",
        "abil", "abila", "abile", "abili", "abilă",
        "ibil", "ibila", "ibile", "ibili", "ibilă",
        "oasa", "oasă", "oase", "os", "osi", "oşi",
        "ant", "anta", "ante", "anti", "antă",
        "ator", "atori",
        "itate", "itati", "ităi", "ităţi",
        "iv", "iva", "ive", "ivi", "ivă")
      val istGroup = Seq("ism", "isme", "ist", "ista", "iste", "isti",
        "istă", "işti")
      val iuneGroup = Seq("iune", "iuni")
      val all = (delPlain.map((_, "del")) ++ istGroup.map((_, "ist")) ++
        iuneGroup.map((_, "iune"))).sortBy(-_._1.length)
      all.find { case (s, _) => ends(s) } match {
        case Some((suf, kind)) if sufStart(suf) >= r2 =>
          kind match {
            case "del" => del(suf); step1or2Removed = true
            case "ist" => rep(suf, "ist"); step1or2Removed = true
            case "iune" =>
              // iune/iuni delete only when preceded by ţ, which becomes t
              val p = sufStart(suf)
              if (p >= 1 && b.charAt(p - 1) == 'ţ') {
                del(suf); b.setCharAt(b.length - 1, 't')
                step1or2Removed = true
              }
          }
        case _ =>
      }
    }

    // step 3: verb suffixes in RV (only if steps 1-2 removed nothing);
    // group 1 needs a preceding consonant or 'u' (itself in RV)
    if (!step1or2Removed) {
      val g1 = Seq("are", "ere", "ire", "âre", "ind", "ând", "indu", "ându",
        "eze", "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte",
        "ăsc", "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "ea",
        "eaţi", "eau", "iam", "iai", "ia", "iaţi", "iau", "ui", "aşi",
        "arăm", "arăţi", "ară", "uşi", "urăm", "urăţi", "ură", "işi",
        "irăm", "irăţi", "iră", "âi", "âşi", "ârăm", "ârăţi", "âră",
        "im", "âm", "aţi", "eţi", "iţi", "âţi")
      val g2 = Seq("ăm", "asem", "aseşi", "ase", "aserăm", "aserăţi",
        "aseră", "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
        "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
        "usem", "useşi", "use", "userăm", "userăţi", "useră",
        "seşi", "serăm", "serăţi", "seră", "sei", "se",
        "sesem", "seseşi", "sese", "seserăm", "seserăţi", "seseră")
      val all = (g1.map((_, true)) ++ g2.map((_, false))).sortBy(-_._1.length)
      all.find { case (s, _) => ends(s) && sufStart(s) >= rv } match {
        case Some((suf, needsCons)) =>
          val p = sufStart(suf)
          val prevOk = !needsCons ||
            (p >= 1 && p - 1 >= rv && (!isV(b.charAt(p - 1)) ||
              b.charAt(p - 1) == 'u' || b.charAt(p - 1) == 'U'))
          if (prevOk) del(suf)
        case None =>
      }
    }

    // step 4: final vowel in RV
    Seq("ie", "a", "e", "i", "ă").sortBy(-_.length)
      .find(s => ends(s) && sufStart(s) >= rv)
      .foreach(del)

    b.toString.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  // ---------------------------------------------------------------- finnish

  private val fiVowels = "aeiouyäö".toSet
  private val fiRestrictedV = "aeiouäö".toSet // V for the Vi condition

  /** Snowball Finnish (snowballstem.org/algorithms/finnish/stemmer.html):
    * R1/R2; step 1 particles, step 2 possessives, step 3 cases, step 4
    * comparatives, step 5 plurals (conditional on step 3), step 6 tidy
    * (long-vowel shortening, cX/oj/uj/jo trims, final double-consonant
    * undoubling through trailing vowels). */
  def finnish(word: String): String = {
    if (word.length <= 2) return word
    val b = new StringBuilder(word)
    def isV(c: Char) = fiVowels(c)
    val (r1, r2) = regions(b, isV)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def endsLong: Boolean = Seq("aa", "ee", "ii", "oo", "uu", "ää", "öö")
      .exists(ends)

    // step 1: particles etc, in R1
    locally {
      val k = Seq("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa", "pä")
      k.sortBy(-_.length).find(ends) match {
        case Some(suf) =>
          val p = sufStart(suf)
          // preceded by n, t or a vowel
          if (p >= r1 && p >= 1 &&
              ("nt".contains(b.charAt(p - 1)) || isV(b.charAt(p - 1))))
            del(suf)
        case None =>
          if (ends("sti") && sufStart("sti") >= r2) del("sti")
      }
    }

    // step 2: possessives, in R1
    locally {
      val p2 = Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
      p2.sortBy(-_.length).find(s => ends(s) && sufStart(s) >= r1) match {
        case Some("si") =>
          if (b.length >= 3 && b.charAt(b.length - 3) != 'k') del("si")
        case Some("ni") =>
          del("ni")
          if (ends("kse")) b.setCharAt(b.length - 1, 'i') // kse -> ksi
        case Some("an") =>
          val head = b.substring(0, sufStart("an"))
          if (Seq("ta", "ssa", "sta", "lla", "lta", "na").exists(head.endsWith))
            del("an")
        case Some("än") =>
          val head = b.substring(0, sufStart("än"))
          if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä").exists(head.endsWith))
            del("än")
        case Some("en") =>
          val head = b.substring(0, sufStart("en"))
          if (Seq("lle", "ine").exists(head.endsWith)) del("en")
        case Some(suf) => del(suf) // nsa nsä mme nne
        case None =>
      }
    }

    // step 3: cases, in R1
    var step3Removed = false
    locally {
      val hXn = Seq(("han", 'a'), ("hen", 'e'), ("hin", 'i'), ("hon", 'o'),
        ("hun", 'u'), ("hyn", 'y'), ("hän", 'ä'), ("hön", 'ö'))
      val plain = Seq("ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
        "ltä", "lle", "ksi", "ine", "tta", "ttä", "ta", "tä", "na", "nä")
      val special = Seq("siin", "den", "tten", "seen")
      val all: Seq[(String, String)] =
        (hXn.map { case (s, _) => (s, "hXn") } ++
          special.map(s => (s, if (s == "seen") "seen" else "Vi")) ++
          plain.map((_, "plain")) ++ Seq(("a", "cv"), ("ä", "cv"), ("n", "n")))
      all.sortBy(-_._1.length).find { case (s, _) =>
        ends(s) && sufStart(s) >= r1 } match {
        case Some((suf, kind)) =>
          val p = sufStart(suf)
          kind match {
            case "hXn" =>
              val x = hXn.find(_._1 == suf).get._2
              if (p >= 1 && b.charAt(p - 1) == x) { del(suf); step3Removed = true }
            case "Vi" => // siin/den/tten preceded by V then i
              if (p >= 2 && b.charAt(p - 1) == 'i' &&
                  fiRestrictedV(b.charAt(p - 2))) {
                del(suf); step3Removed = true
              }
            case "seen" => // preceded by a long vowel
              if (p >= 2 && b.charAt(p - 1) == b.charAt(p - 2) &&
                  isV(b.charAt(p - 1))) {
                del(suf); step3Removed = true
              }
            case "plain" =>
              // tta/ttä need a preceding e
              if (suf == "tta" || suf == "ttä") {
                if (p >= 1 && b.charAt(p - 1) == 'e') {
                  del(suf); step3Removed = true
                }
              } else { del(suf); step3Removed = true }
            case "cv" => // a/ä preceded by consonant + vowel
              if (p >= 2 && !isV(b.charAt(p - 2)) && isV(b.charAt(p - 1))) {
                del(suf); step3Removed = true
              }
            case "n" =>
              del("n"); step3Removed = true
              if (endsLong || ends("ie")) b.setLength(b.length - 1)
          }
        case None =>
      }
    }

    // step 4: other endings (comparatives), in R2
    locally {
      val imp = Seq("impi", "impa", "impä", "immi", "imma", "immä",
        "eja", "ejä")
      val mp = Seq("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
      (imp.map((_, false)) ++ mp.map((_, true))).sortBy(-_._1.length)
        .find { case (s, _) => ends(s) && sufStart(s) >= r2 }
        .foreach { case (suf, checkPo) =>
          val p = sufStart(suf)
          if (!checkPo || !(p >= 2 && b.substring(p - 2, p) == "po")) del(suf)
        }
    }

    // step 5: plurals
    if (step3Removed) {
      Seq("i", "j").find(s => ends(s) && sufStart(s) >= r1).foreach(del)
    } else if (ends("t") && sufStart("t") >= r1 && b.length >= 2 &&
        isV(b.charAt(b.length - 2))) {
      del("t")
      if (ends("imma") && sufStart("imma") >= r2) del("imma")
      else if (ends("mma") && sufStart("mma") >= r2 &&
          !(sufStart("mma") >= 2 &&
            b.substring(sufStart("mma") - 2, sufStart("mma")) == "po"))
        del("mma")
    }

    // step 6: tidy
    // a) R1 ends with a long vowel: shorten
    if (endsLong && b.length - 1 >= r1) b.setLength(b.length - 1)
    // b) R1 ends consonant + one of a ä e i: drop the vowel
    if (b.length >= 2 && b.length - 1 >= r1 && "aäei".contains(b.charAt(b.length - 1)) &&
        !isV(b.charAt(b.length - 2)))
      b.setLength(b.length - 1)
    // c) R1 ends oj / uj: drop the j
    if ((ends("oj") || ends("uj")) && b.length - 1 >= r1)
      b.setLength(b.length - 1)
    // d) R1 ends jo: drop the o
    if (ends("jo") && b.length - 1 >= r1) b.setLength(b.length - 1)
    // e) a double consonant followed by zero or more trailing vowels loses
    // its first member (eläkk -> eläk, aatonaatto -> aatonaato)
    locally {
      var j = b.length - 1
      while (j >= 0 && isV(b.charAt(j))) j -= 1
      if (j >= 1 && !isV(b.charAt(j)) && b.charAt(j) == b.charAt(j - 1))
        b.deleteCharAt(j)
    }
    b.toString
  }

  // --------------------------------------------------------------- hungarian

  private val huVowels = "aáeéiíoóöőuúüű".toSet
  private val huDigraphs = Seq("cs", "dzs", "dz", "gy", "ly", "ny", "sz",
    "ty", "zs")
  // doubled consonants (incl. doubled digraphs written with the first
  // letter repeated: ssz, lly, ...) recognized by the undoubling steps
  private val huDoubles = Seq("bb", "cc", "ccs", "dd", "ff", "gg", "ggy",
    "jj", "kk", "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
    "tt", "tty", "vv", "zz", "zzs")

  /** Snowball Hungarian (snowballstem.org/algorithms/hungarian/stemmer.html).
    * R1 only: word starts with a vowel → after the first consonant or
    * digraph; starts with a consonant → after the first vowel. Steps:
    * instrumental → case endings → special/other cases → factive → owned →
    * singular owner → plural owner → plural; assimilated suffixes undouble
    * the preceding consonant; á/é left exposed normalize to a/e. */
  def hungarian(word: String): String = {
    if (word.length <= 2) return word
    val b = new StringBuilder(word)
    def isV(c: Char) = huVowels(c)
    val r1: Int = {
      if (isV(b.charAt(0))) {
        // after the first consonant — a digraph counts as one consonant
        var i = 1
        while (i < b.length && isV(b.charAt(i))) i += 1
        if (i >= b.length) b.length
        else {
          val dig = huDigraphs.find(d => b.indexOf(d, i) == i)
          i + dig.map(_.length).getOrElse(1)
        }
      } else {
        var i = 0
        while (i < b.length && !isV(b.charAt(i))) i += 1
        if (i < b.length) i + 1 else b.length
      }
    }

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    def endsDouble: Boolean = huDoubles.exists(ends)
    def undouble(): Unit =
      huDoubles.sortBy(-_.length).find(ends).foreach { d =>
        // ssz -> sz, bb -> b: drop the first letter of the double
        b.deleteCharAt(b.length - d.length)
      }
    def vEnding(): Unit = // an exposed final á/é loses its accent
      if (b.nonEmpty) b.charAt(b.length - 1) match {
        case 'á' => b.setCharAt(b.length - 1, 'a')
        case 'é' => b.setCharAt(b.length - 1, 'e')
        case _ =>
      }
    /** longest match from (suffix -> replacement) in R1; "" = delete. */
    def amongR1(table: Seq[(String, String)]): Boolean =
      table.sortBy(-_._1.length)
        .find { case (s, _) => ends(s) && sufStart(s) >= r1 } match {
        case Some((suf, to)) =>
          if (to.isEmpty) del(suf)
          else b.replace(sufStart(suf), b.length, to)
          true
        case None => false
      }

    // 1. instrumental: al/el after a doubled consonant, undoubled
    Seq("al", "el").find(s => ends(s) && sufStart(s) >= r1).foreach { s =>
      val saved = b.toString
      del(s)
      if (endsDouble) undouble() else b.replace(0, b.length, saved)
    }
    // 2. frequent case endings, then normalize an exposed á/é
    if (amongR1(Seq("ban", "ben", "ba", "be", "ra", "re", "nak", "nek",
        "val", "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz",
        "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt", "ért",
        "képpen", "képp", "kor", "ul", "ül", "vá", "vé", "onként",
        "enként", "anként", "ként", "en", "on", "an", "ön", "n", "t")
        .map((_, "")))) vEnding()
    // 3. special cases
    amongR1(Seq(("ánként", "a"), ("án", "a"), ("én", "e")))
    // 4. other cases
    amongR1(Seq(("astul", ""), ("estül", ""), ("ástul", "a"),
      ("éstül", "e"), ("stul", ""), ("stül", "")))
    // 5. factive á/é after a doubled consonant, undoubled
    Seq("á", "é").find(s => ends(s) && sufStart(s) >= r1).foreach { s =>
      val saved = b.toString
      del(s)
      if (endsDouble) undouble() else b.replace(0, b.length, saved)
    }
    // 6. owned
    amongR1(Seq(("oké", ""), ("öké", ""), ("aké", ""), ("eké", ""),
      ("áké", "a"), ("éké", "e"), ("ké", ""), ("áéi", "a"), ("ééi", "e"),
      ("éi", ""), ("é", "")))
    // 7. singular owner
    if (amongR1(Seq(("ünk", ""), ("unk", ""), ("ánk", "a"), ("énk", "e"),
        ("nk", ""), ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""),
        ("uk", ""), ("ük", ""), ("ám", "a"), ("ém", "e"), ("am", ""),
        ("em", ""), ("om", ""), ("öm", ""), ("m", ""), ("ád", "a"),
        ("éd", "e"), ("ad", ""), ("ed", ""), ("od", ""), ("öd", ""),
        ("d", ""), ("ja", ""), ("je", ""), ("a", ""), ("e", ""),
        ("o", ""), ("á", "a"), ("é", "e")))) ()
    // 8. plural owner
    amongR1(Seq(("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
      ("aim", ""), ("eim", ""), ("im", ""),
      ("jaid", ""), ("jeid", ""), ("áid", "a"), ("éid", "e"),
      ("aid", ""), ("eid", ""), ("id", ""),
      ("jai", ""), ("jei", ""), ("ái", "a"), ("éi", "e"),
      ("ai", ""), ("ei", ""),
      ("jaink", ""), ("jeink", ""), ("áink", "a"), ("éink", "e"),
      ("aink", ""), ("eink", ""), ("ink", ""),
      ("jaitok", ""), ("jeitek", ""), ("áitok", "a"), ("éitek", "e"),
      ("aitok", ""), ("eitek", ""), ("itek", ""),
      ("jaik", ""), ("jeik", ""), ("áik", "a"), ("éik", "e"),
      ("aik", ""), ("eik", ""), ("ik", ""), ("i", "")))
    // 9. plural
    amongR1(Seq(("ák", "a"), ("ék", "e"), ("ök", ""), ("ok", ""),
      ("ek", ""), ("ak", ""), ("k", "")))
    b.toString
  }

  // ---------------------------------------------------------------- turkish

  private val trVowels = "aeıioöuü".toSet

  /** Snowball Turkish (Evren Kapusuz Çilden's algorithm,
    * snowballstem.org/algorithms/turkish/stemmer.html). Faithful to the
    * published structure: words of more than one syllable strip one
    * nominal-verb suffix, then noun suffixes to a fixpoint (which subsumes
    * the ki-chain), every strip gated by fourfold/twofold VOWEL HARMONY
    * with the stem's last vowel and by the buffer-consonant rule (a y/n/s
    * buffer must itself follow a vowel; a vowel-initial suffix without a
    * buffer must follow a consonant); final b/c/d/ğ devoice to p/ç/t/k.
    * Condensation vs the .sbl (documented): the original's
    * per-suffix-ordering flags (`continue_stemming_noun_suffixes`) and the
    * append-harmonic-vowel postlude for d/g-final stems are folded into
    * the fixpoint loop + devoicing. */
  def turkish(word: String): String = {
    if (word.count(trVowels) <= 1) return word // one syllable: never stemmed
    val b = new StringBuilder(word)
    def lastVowelBefore(p: Int): Char = {
      var i = p - 1
      while (i >= 0 && !trVowels(b.charAt(i))) i -= 1
      if (i >= 0) b.charAt(i) else ' '
    }
    // fourfold harmony classes: a/ı after back unrounded, i after front
    // unrounded, u after back rounded, ü after front rounded; twofold:
    // a after back, e after front
    def harmonic(stemV: Char, sufV: Char): Boolean = sufV match {
      case 'a' => "aıou".contains(stemV)
      case 'e' => "eiöü".contains(stemV)
      case 'ı' => "aı".contains(stemV)
      case 'i' => "ei".contains(stemV)
      case 'u' => "ou".contains(stemV)
      case 'ü' => "öü".contains(stemV)
      case _ => true // suffix with no harmony vowel (ken, ki)
    }
    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf

    /** Try to strip `suf`; `buffered` marks a leading y/n/s buffer
      * consonant. Conditions: at least one vowel must remain in the stem;
      * the harmony vowel (first vowel of the suffix) must harmonize with
      * the stem's last remaining vowel; a buffer consonant must follow a
      * vowel; a vowel-initial unbuffered suffix must follow a consonant. */
    def strip(suf: String, buffered: Boolean): Boolean = {
      if (!ends(suf)) return false
      val p = b.length - suf.length
      if (p < 1) return false
      val stem = b.substring(0, p)
      if (!stem.exists(trVowels)) return false
      val sufV = suf.find(trVowels).getOrElse(' ')
      if (!harmonic(lastVowelBefore(p), sufV)) return false
      val prev = b.charAt(p - 1)
      if (buffered && !trVowels(prev)) return false // y/n/s buffer needs a vowel
      if (!buffered && trVowels(suf.head) && trVowels(prev)) return false
      b.setLength(p)
      true
    }
    /** Suffix class in the .sbl's notation: A -> a/e, U -> ı/i/u/ü,
      * D -> d/t (voicing assimilation variants), with optional
      * (y)/(n)/(s) buffer prefix; longest concrete form wins. */
    def expandU(pat: String): Seq[String] = {
      def ex(s: String): Seq[String] =
        if (s.contains('A')) Seq("a", "e").flatMap(v => ex(s.replaceFirst("A", v)))
        else if (s.contains('U'))
          Seq("ı", "i", "u", "ü").flatMap(v => ex(s.replaceFirst("U", v)))
        else if (s.contains('D'))
          Seq("d", "t").flatMap(v => ex(s.replaceFirst("D", v)))
        else Seq(s)
      ex(pat)
    }
    def tryClass(body: String, buffers: Seq[String] = Nil): Boolean = {
      val withBuf = buffers.flatMap(bf => expandU(bf + body).map((_, true)))
      val plain = expandU(body).map((_, false))
      (withBuf ++ plain).sortBy(-_._1.length)
        .exists { case (s, buf) => strip(s, buf) }
    }

    // --- one nominal verb suffix, in the published precedence order.
    // lAr is tracked separately: after a copular/plural -lAr the published
    // chain continues only through the ki chain, never through the bare
    // possessive vowels (kediler must stop at kedi), while after a true
    // verbal suffix (-ydU etc.) an inner possessive is still outermost
    // (arabasıydı -> arabası -> araba).
    var larStripped = false
    val nominalVerb: Seq[() => Boolean] = Seq(
      () => tryClass("cAsInA"),
      () => tryClass("mUş", Seq("y")),
      () => tryClass("sUnUz"),
      () => strip("ydu", true) || strip("ydü", true) || strip("ydı", true) ||
        strip("ydi", true) || tryClass("DU"),
      () => strip("yken", buffered = true) || strip("ken", buffered = false),
      () => tryClass("sA", Seq("y")),
      () => tryClass("UmUz", Seq("y")),
      () => tryClass("sUn"),
      () => tryClass("Uz", Seq("y")),
      () => tryClass("Um", Seq("y")),
      () => tryClass("DUr"),
      () => { larStripped = tryClass("lAr"); larStripped })
    nominalVerb.exists(_())

    // --- noun suffixes: the chain classes iterate to a fixpoint (which
    // subsumes the .sbl's explicit try-chains and the ki chain:
    // evlerinden -> evleri -> ev), but the bare single-vowel case/
    // possessive suffixes (y)A / (s/y)U may only strip on the FIRST pass —
    // they are outermost-only in the published chains, and looping them
    // would eat root-final vowels (kediler -> kedi must stop, not
    // continue to ked)
    val nounChain: Seq[() => Boolean] = Seq(
      () => tryClass("lArI"),
      () => tryClass("nDAn"),
      () => tryClass("DAn"),
      () => tryClass("nDA"),
      () => tryClass("DA"),
      () => tryClass("lA", Seq("y")),
      () => tryClass("nA"),
      () => tryClass("nUn"),
      () => tryClass("Un", Seq("n")),
      () => tryClass("UmUz"),
      () => tryClass("UnUz"),
      () => strip("ki", buffered = false),
      () => tryClass("cA", Seq("n")),
      () => tryClass("lAr"))
    val nounOuterOnly: Seq[() => Boolean] = Seq(
      () => tryClass("A", Seq("y")),
      () => tryClass("U", Seq("s", "y")))
    val firstPass = if (larStripped) nounChain else nounChain ++ nounOuterOnly
    var changed = firstPass.exists(_())
    while (changed) changed = nounChain.exists(_())

    // --- postlude: final-consonant devoicing
    if (b.nonEmpty) b.charAt(b.length - 1) match {
      case 'b' => b.setCharAt(b.length - 1, 'p')
      case 'c' => b.setCharAt(b.length - 1, 'ç')
      case 'd' => b.setCharAt(b.length - 1, 't')
      case 'ğ' => b.setCharAt(b.length - 1, 'k')
      case _ =>
    }
    b.toString
  }

  // ---------------------------------------------------------------- arabic

  /** Snowball Arabic (Assem Chelli's algorithm,
    * snowballstem.org/algorithms/arabic/stemmer.html). Implemented steps:
    * pre-normalization (tashkeel diacritics, tatweel, hamza-form and
    * alef-variant normalization), the noun suffix chain (attached pronouns,
    * dual/plural markers, taa marbuta), the verb suffix chain, and the
    * prefix chain (conjunction waw, prepositions, definite article, verb
    * prefixes) with the published minimum-length gates. The .sbl's
    * is_noun/is_verb dual-track speculation is condensed to the
    * noun-then-verb order its default path takes. */
  def arabic(word0: String): String = {
    // normalize_pre: strip tashkeel (U+064B..U+0652), superscript alef
    // (U+0670), tatweel (U+0640); normalize alef variants and yeh hamza
    val word = word0.flatMap { c =>
      val cp = c.toInt
      if (cp >= 0x064B && cp <= 0x0652) ""
      else if (cp == 0x0670 || cp == 0x0640) ""
      else c match {
        case 'أ' | 'إ' | 'آ' | 'ٱ' => "ا"
        case 'ؤ' => "ء"
        case 'ئ' => "ء"
        case c2 => c2.toString
      }
    }
    if (word.length <= 2) return word
    val b = new StringBuilder(word)
    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def del(n: Int): Unit = b.setLength(b.length - n)
    def starts(pre: String): Boolean =
      b.length >= pre.length && b.substring(0, pre.length) == pre

    // ---- suffixes (backwards section). Length gates follow the published
    // rule: a strip must leave >= 2 chars (most amongs test length > 3/4/5
    // pre-strip, equivalent at these suffix lengths).
    // noun step 1a: attached pronouns
    locally {
      val prons = Seq("كما", "هما", "ها", "هم", "هن", "نا", "كم", "كن",
        "ه", "ك", "ي")
      prons.sortBy(-_.length).find(s => ends(s) && b.length - s.length >= 2)
        .foreach(s => del(s.length))
    }
    // noun step 1b/2: dual & sound plural markers, feminine plural
    locally {
      val pl = Seq("تان", "تين", "ات", "ان", "ين", "ون", "وا")
      pl.sortBy(-_.length).find(s => ends(s) && b.length - s.length >= 2)
        .foreach(s => del(s.length))
    }
    // noun step 3: taa marbuta / final yeh-alef
    if (ends("ة") && b.length >= 3) del(1)
    if (ends("ية") && b.length >= 4) del(2)
    // verb suffixes (apply when still long: the published verb amongs gate
    // on length > 3..5)
    if (b.length >= 4) {
      val vs = Seq("تموها", "تموه", "تما", "تمو", "تم", "تن", "وا", "ون",
        "ين", "ان", "تا", "ت", "ن", "ا")
      vs.sortBy(-_.length).find(s => ends(s) && b.length - s.length >= 3)
        .foreach(s => del(s.length))
    }
    // alef maqsura -> yeh (Suffix_All_alef_maqsura)
    if (b.nonEmpty && b.charAt(b.length - 1) == 'ى')
      b.setCharAt(b.length - 1, 'ي')

    // ---- prefixes. Conjunction waw first (needs >= 4 chars left: the
    // published Prefix_Step1 gates), then prepositions + definite article.
    if (b.length >= 4 && (starts("وو") || starts("و")) ) {
      if (starts("وو")) b.deleteCharAt(0)
      else if (b.length >= 4) b.deleteCharAt(0)
    }
    locally {
      val arts = Seq("بال", "كال", "فال", "وال", "ال", "لل")
      arts.sortBy(-_.length).find(p => starts(p) && b.length - p.length >= 2)
        .foreach(p => b.delete(0, p.length))
    }
    // preposition lam/ba/ka fused without article (لكتاب -> كتاب) only when
    // a long stem remains — the published Prefix_Step3a/4 length-5 gates
    if (b.length >= 5 && (starts("ل") || starts("ب") || starts("ك")))
      b.deleteCharAt(0)
    // verb prefixes: the future marker س before an imperfect marker is
    // stripped; bare imperfect markers (ي ت ن) are only stripped on the
    // .sbl's verb track, which the condensed single track conservatively
    // keeps — stripping them noun-side would maim ياء/تاء-initial nouns
    if (b.length >= 5 && starts("س") && "يتن".contains(b.charAt(1)))
      b.deleteCharAt(0)
    b.toString
  }

  // ----------------------------------------------------------------- greek

  private val elVowels = "αεηιουω".toSet

  /** Greek stemmer (Ntais' published algorithm, the one Snowball
    * distributes as greek.sbl via Saroukos' revision). Operates internally
    * on lowercase unaccented Greek (the tokenizer lowercases; accents fold
    * here). Implements the algorithm's shape: the irregular-noun table,
    * the -άδες/-έδες/-ούδες/-έως noun steps with their re-append exception
    * sets, the -ιά/-ικά adjective steps with the vowel re-append rule, the
    * verb-suffix steps (-άγαμε/-άνε/-έτε/-οντας/-όμαστε families), the
    * comparative step, and the final common-ending removal. The published
    * exception word-lists longer than the retrieval-relevant core are
    * carried for the steps above; steps whose lists are omitted are noted
    * inline. */
  def greek(word0: String): String = {
    // fold accents/dialytika, final sigma
    val word = word0.map {
      case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'; case 'ί' => 'ι'
      case 'ό' => 'ο'; case 'ύ' => 'υ'; case 'ώ' => 'ω'; case 'ϊ' => 'ι'
      case 'ϋ' => 'υ'; case 'ΐ' => 'ι'; case 'ΰ' => 'υ'; case 'ς' => 'σ'
      case c => c
    }
    if (word.length <= 3 || !word.forall(c => c >= 'α' && c <= 'ω')) return word
    val b = new StringBuilder(word)
    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def del(n: Int): Unit = b.setLength(b.length - n)
    def endsAny(sufs: Seq[String]): Option[String] =
      sufs.sortBy(-_.length).find(ends)
    def endsVowel: Boolean = b.nonEmpty && elVowels(b.charAt(b.length - 1))

    // step 1: irregular nouns (the published mapping table)
    locally {
      val map = Seq(
        ("φαγια", "φα"), ("φαγιου", "φα"), ("φαγιων", "φα"),
        ("σκαγια", "σκα"), ("σκαγιου", "σκα"), ("σκαγιων", "σκα"),
        ("ολογιου", "ολο"), ("ολογια", "ολο"), ("ολογιων", "ολο"),
        ("σογιου", "σο"), ("σογια", "σο"), ("σογιων", "σο"),
        ("τατογια", "τατο"), ("τατογιου", "τατο"), ("τατογιων", "τατο"),
        ("κρεασ", "κρε"), ("κρεατοσ", "κρε"), ("κρεατα", "κρε"),
        ("κρεατων", "κρε"),
        ("περασ", "περ"), ("περατοσ", "περ"), ("περατα", "περ"),
        ("περατων", "περ"),
        ("τερασ", "τερ"), ("τερατοσ", "τερ"), ("τερατα", "τερ"),
        ("τερατων", "τερ"),
        ("φωσ", "φω"), ("φωτοσ", "φω"), ("φωτα", "φω"), ("φωτων", "φω"),
        ("καθεστωσ", "καθεστ"), ("καθεστωτοσ", "καθεστ"),
        ("καθεστωτα", "καθεστ"), ("καθεστωτων", "καθεστ"),
        ("γεγονοσ", "γεγον"), ("γεγονοτοσ", "γεγον"),
        ("γεγονοτα", "γεγον"), ("γεγονοτων", "γεγον"))
      map.sortBy(-_._1.length).find { case (s, _) => ends(s) } match {
        case Some((s, to)) => b.replace(b.length - s.length, b.length, to)
        case None =>
      }
    }

    // step 2a: -αδες/-αδων
    endsAny(Seq("αδεσ", "αδων")).foreach { s =>
      del(s.length)
      val keep = Seq("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
        "νταντ", "κυρ", "θει", "πεθερ")
      if (!keep.exists(ends)) b.append("αδ")
    }
    // step 2b: -εδες/-εδων
    endsAny(Seq("εδεσ", "εδων")).foreach { s =>
      del(s.length)
      val keep = Seq("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")
      if (keep.exists(ends)) b.append("εδ")
    }
    // step 2c: -ουδες/-ουδων
    endsAny(Seq("ουδεσ", "ουδων")).foreach { s =>
      del(s.length)
      val keep = Seq("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
        "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
      if (keep.exists(ends)) b.append("ουδ")
    }
    // step 2d: -εως/-εων
    endsAny(Seq("εωσ", "εων")).foreach { s =>
      del(s.length)
      val keep = Seq("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
      if (keep.contains(b.toString)) b.append("ε")
    }
    // step 3: -ια/-ιου/-ιων after a vowel re-append ι
    endsAny(Seq("ιων", "ιου", "ια")).foreach { s =>
      del(s.length)
      if (endsVowel) b.append("ι")
    }
    // step 4: -ικα/-ικου/-ικων/-ικο
    endsAny(Seq("ικων", "ικου", "ικα", "ικο")).foreach { s =>
      del(s.length)
      val keep = Seq("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
        "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
        "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
        "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
        "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ")
      if (endsVowel || keep.contains(b.toString)) b.append("ικ")
    }
    // step 5a/5b: verb -αγαμε/-ησαμε/-ουσαμε/-αμε and -αγανε/-ησανε/
    // -ουσανε/-ανε families
    if (b.toString == "αγαμε") b.replace(0, b.length, "αγαμ")
    endsAny(Seq("ηθηκαμε", "ουσαμε", "ηκαμε", "ησαμε", "αγαμε")).foreach { s =>
      del(s.length)
    }
    if (ends("αμε")) {
      del(3)
      val keep = Seq("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
        "πεθ", "πικρ", "ποτ", "σιχ", "χ")
      if (keep.contains(b.toString)) b.append("αμ")
    }
    endsAny(Seq("ηθηκανε", "ουσανε", "ιουντανε", "ηκανε", "ησανε",
      "αγανε")).foreach { s => del(s.length) }
    if (ends("ανε")) {
      del(3)
      val keep = Seq("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
        "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
        "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
        "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
        "ορφ", "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ",
        "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ",
        "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ",
        "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ",
        "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ",
        "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ",
        "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ",
        "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ",
        "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ",
        "υποκοπ", "χαμηλοδαπ", "ψηλοταβ")
      if (endsVowel || keep.contains(b.toString)) b.append("αν")
    }
    // step 6: -ετε
    endsAny(Seq("ησετε", "ετε")).foreach { s =>
      del(s.length)
      val keepEnd = Seq("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ",
        "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
        "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ", "εκθ",
        "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")
      val keepWhole = Seq("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ",
        "αφ", "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ",
        "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ",
        "προστ", "προσωποπ", "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
        "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν", "επιτ",
        "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ")
      if (endsVowel || keepEnd.exists(ends) || keepWhole.contains(b.toString))
        b.append("ετ")
    }
    // step 7: -οντας/-ωντας
    endsAny(Seq("οντασ", "ωντασ")).foreach { s =>
      val wasOmega = s.startsWith("ω")
      del(s.length)
      if (b.toString == "αρχ") b.append("οντ")
      else if (wasOmega && ends("κρε")) b.append("ωντ")
    }
    // step 8: -ομαστε/-ιομαστε
    endsAny(Seq("ιομαστε", "ομαστε")).foreach { s =>
      del(s.length)
      if (b.toString == "ον") b.append("ομαστ")
    }
    // step 9: -εστε/-ιεστε
    endsAny(Seq("ιεστε", "εστε")).foreach { s =>
      del(s.length)
      val keep = Seq("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
      if (keep.contains(b.toString)) b.append("εστ")
    }
    // step 10: -ηκα/-ηκες/-ηκε families
    endsAny(Seq("ηθηκεσ", "ηθηκα", "ηθηκε")).foreach(s => del(s.length))
    endsAny(Seq("ηκεσ", "ηκα", "ηκε")).foreach { s =>
      del(s.length)
      val keepEnd = Seq("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
      val keepWhole = Seq("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
      if (keepEnd.exists(ends) || keepWhole.contains(b.toString))
        b.append("ηκ")
    }
    // step 11: -ουσα/-ουσες/-ουσε
    endsAny(Seq("ουσεσ", "ουσα", "ουσε")).foreach { s =>
      del(s.length)
      val keepEnd = Seq("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ",
        "μαλλ", "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
      val keepWhole = Seq("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
        "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν",
        "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ")
      if (endsVowel || keepEnd.exists(ends) || keepWhole.contains(b.toString))
        b.append("ουσ")
    }
    // step 12: -αγα/-αγες/-αγε
    endsAny(Seq("αγεσ", "αγα", "αγε")).foreach { s =>
      del(s.length)
      val keepEnd = Seq("τρ", "τσ")
      val keepWhole = Seq("φρ", "καθαρευ", "πλ")
      val except = Seq("κολλ") // never re-append after κολλ
      if (!except.exists(ends) &&
          (endsVowel || keepEnd.exists(ends) || keepWhole.contains(b.toString)))
        b.append("αγ")
    }
    // step 13: -ησε/-ησου/-ησα
    endsAny(Seq("ησου", "ησε", "ησα")).foreach { s =>
      del(s.length)
      val keep = Seq("θ", "επιθ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
        "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ")
      if (keep.contains(b.toString)) b.append("ησ")
    }
    // step 14: -ηστε
    if (ends("ηστε")) {
      del(4)
      val keep = Seq("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
        "ευχρ", "κοινοχρ", "παλιμψ")
      if (keep.contains(b.toString)) b.append("ηστ")
    }
    // step 15: -ουνε/-ησουνε/-ηθουνε
    endsAny(Seq("ηθουνε", "ησουνε", "ουνε")).foreach { s =>
      del(s.length)
      val keep = Seq("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
      if (keep.contains(b.toString)) b.append("ουν")
    }
    // step 16: -ουμε/-ησουμε/-ηθουμε
    endsAny(Seq("ηθουμε", "ησουμε", "ουμε")).foreach { s =>
      del(s.length)
      val keep = Seq("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
        "ασουσ")
      if (keep.contains(b.toString)) b.append("ουμ")
    }
    // step 17 (comparatives): -τερος/-τερη/... -τατος family
    endsAny(Seq("οτεροσ", "οτερη", "οτερο", "οτερεσ", "οτεροι", "οτερουσ",
      "οτερων", "οτερα", "οτατοσ", "οτατη", "οτατο", "οτατεσ", "οτατοι",
      "οτατουσ", "οτατων", "οτατα",
      "υτεροσ", "υτερη", "υτερο", "υτερα", "υτατοσ", "υτατη", "υτατο",
      "υτατα",
      "ωτεροσ", "ωτερη", "ωτερο", "ωτερα", "ωτατοσ", "ωτατη", "ωτατο",
      "ωτατα",
      "εστεροσ", "εστερη", "εστερο", "εστερα", "εστατοσ", "εστατη",
      "εστατο", "εστατα")).foreach(s => del(s.length))
    // final step: common noun/adjective/verb endings
    locally {
      val common = Seq("ιουσ", "ιασ", "ιεσ", "ιοσ", "ιοι", "ιον", "ιου",
        "ιων", "ιο", "ια", "ιι", "ι",
        "ουσ", "ωσ", "ασ", "εσ", "ησ", "οσ", "υσ", "οι", "ου", "ων",
        "αν", "ον", "εν", "ην", "υν",
        "α", "ε", "η", "ο", "υ", "ω")
      endsAny(common).foreach { s =>
        if (b.length - s.length >= 2) del(s.length)
      }
    }
    b.toString
  }

  // ----------------------------------------------------------------- tamil

  /** Tamil stemmer (Damodharan's algorithm, the one Snowball distributes
    * as tamil.sbl). Operates on Tamil Unicode text: steps remove question
    * clitics (ஓ/ஏ/ஆ), the -um clitic, plural markers (-கள் with the
    * ற்கள்/ட்கள் sandhi reversals), common word endings, the vetrumai
    * urupukal case endings, and the tense-suffix families; `fixEndings`
    * restores a bare consonant after each removal the way the published
    * algorithm's fix_ending routine does. */
  def tamil(word0: String): String = {
    if (word0.length <= 3 || word0.head < '஀' || word0.head > '௿')
      return word0
    val b = new StringBuilder(word0)
    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def del(n: Int): Unit = b.setLength(b.length - n)
    def endsAny(sufs: Seq[String]): Option[String] =
      sufs.sortBy(-_.length).find(ends)
    // restore the virama a removed vowel-sign suffix displaced — only when
    // the exposed final char is a bare consonant (a stem ending in a vowel
    // sign, e.g. பள்ளி before க்கு, takes no virama)
    def restoreVirama(): Unit =
      if (b.nonEmpty && b.charAt(b.length - 1) >= '\u0b95' &&
          b.charAt(b.length - 1) <= '\u0bb9') b.append('்')

    // fix_ending: ட்ட்->டு? The published routine trims dangling virama
    // clusters left by suffix removal: a final double consonant loses one,
    // a final consonant+virama after a short stem gains உ
    def fixEndings(): Unit = {
      if (b.length >= 4 && b.charAt(b.length - 1) == '்' &&
          b.charAt(b.length - 3) == '்' &&
          b.charAt(b.length - 2) == b.charAt(b.length - 4))
        del(2) // double consonant: ட்ட் -> ட்
      if (ends("ய்") && b.length >= 3 &&
          "ாிீெேை".contains(b.charAt(b.length - 3)))
        del(2) // glide after long vowel sign
    }

    // question clitics & emphatic: ஓ ஏ ஆ attach as vowel signs replacing
    // the final consonant's own vowel — removal restores the virama so
    // inner suffixes (e.g. the plural in அவர்களோ) re-expose themselves
    endsAny(Seq("ோ", "ே", "ா")).foreach { s =>
      if (b.length - s.length >= 3) { del(s.length); restoreVirama(); fixEndings() }
    }
    // -um clitic: ும் — the ு sign displaced the consonant's virama;
    // restore it (அவனும் -> அவன்)
    if (ends("ும்") && b.length >= 5) { del(3); restoreVirama(); fixEndings() }
    // plural: உங்கள் / ற்கள் / ட்கள் / கள்; a stem left on the
    // assimilated nasal ங் restores the base ம் (புத்தகங்கள்
    // conflates with its singular புத்தகம்)
    def removePlural(): Unit = {
      if (ends("ுங்கள்") && b.length >= 8) del(6)
      else if (ends("ற்கள்") && b.length >= 7) {
        del(5); b.append("ல்") // ற்கள் -> ல்
      } else if (ends("ட்கள்") && b.length >= 7) {
        del(5); b.append("ள்") // ட்கள் -> ள்
      } else if (ends("கள்") && b.length >= 6) {
        del(3)
        if (ends("ங்")) { del(2); b.append("ம்") }
      }
      fixEndings()
    }
    removePlural()
    // common word endings + vetrumai urupukal (case endings)
    locally {
      val cases = Seq(
        "ிலிருந்து", // -ilirunthu
        "ிடம்", // -idam
        "ுடன்", // -udan
        "ால்",       // -aal
        "ுடைய", // -udaiya
        "ுடை",       // -udai
        "ுக்கு", // -ukku
        "ின்",       // -in
        "ில்",       // -il
        "ொடு", // -odu
        "ோடு",       // -oodu
        "க்கு", // -kku dative after vowel-sign stems
        "ை")                    // -ai accusative
      endsAny(cases).foreach { s =>
        // every case suffix begins with a vowel SIGN that displaced the
        // stem-final consonant's virama: restore it, which also re-exposes
        // a chained plural (நண்பர்களுடன் -> நண்பர்கள் -> நண்பர்)
        if (b.length - s.length >= 3) {
          del(s.length); restoreVirama(); fixEndings()
          removePlural()
        }
      }
    }
    // tense suffixes: past/present/future participle + person markers
    locally {
      val tense = Seq(
        "கிறான்",       // -kiraan
        "கிறாள்",       // -kiraal
        "கிறார்கள்",
        "கிறது",             // -kirathu
        "கிறேன்",       // -kiren
        "கிற",                         // -kira
        "ந்தான்",       // -nthaan
        "ந்தாள்",       // -nthaal
        "ந்தது",             // -nthathu
        "ந்தேன்",       // -nthen
        "ந்த",                         // -ntha
        "வான்",                   // -vaan
        "வாள்",                   // -vaal
        "வார்கள்", // -vaarkal
        "வேன்",                   // -ven
        "ட்ட",                         // -tta
        "ன்ற")                         // -nra
      endsAny(tense).foreach { s =>
        if (b.length - s.length >= 3) { del(s.length); fixEndings() }
      }
    }
    b.toString
  }

  // ---------------------------------------------------------------- russian

  private val ruVowels = "аеиоуыэюя".toSet

  def russian(wordIn: String): String = {
    val word = wordIn.replace('ё', 'е')
    if (word.length <= 2 || !word.forall(c => c >= 'а' && c <= 'я' || c == 'ё'))
      return word
    val b = new StringBuilder(word)
    val rv: Int = {
      var i = 0; val n = b.length
      while (i < n && !ruVowels(b.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }
    val (_, r2) = regions(b, ruVowels)

    def ends(suf: String): Boolean =
      b.length >= suf.length && b.substring(b.length - suf.length) == suf
    def sufStart(suf: String): Int = b.length - suf.length
    def del(suf: String): Unit = b.setLength(b.length - suf.length)
    /** Longest suffix from (group1 needing а/я before it, group2 plain),
      * deletable within RV; group-1's preceding а/я stays and must be in RV. */
    def remove(group1: Seq[String], group2: Seq[String]): Boolean = {
      val all = (group1.map((_, true)) ++ group2.map((_, false)))
        .sortBy(-_._1.length)
      all.find { case (s, g1) =>
        ends(s) && sufStart(s) >= rv &&
          (!g1 || (sufStart(s) >= 1 && "ая".contains(b.charAt(sufStart(s) - 1)) &&
            sufStart(s) - 1 >= rv))
      } match {
        case Some((s, _)) => del(s); true
        case None => false
      }
    }

    // step 1
    val gerund = remove(
      Seq("вшись", "вши", "в"),
      Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв"))
    if (!gerund) {
      remove(Nil, Seq("ся", "сь")) // reflexive
      val adjective = remove(Nil, Seq(
        "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
        "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
        "юю", "ая", "яя", "ою", "ею"))
      if (adjective) {
        remove(Seq("ем", "нн", "вш", "ющ", "щ"), Seq("ивш", "ывш", "ующ"))
      } else {
        val verb = remove(
          Seq("ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло",
            "но", "ет", "ют", "ны", "ть", "й", "л", "н"),
          Seq("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
            "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь",
            "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт",
            "ую", "ю"))
        if (!verb) remove(Nil, Seq(
          "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
          "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
          "ом", "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й",
          "о", "у", "ы", "ь", "ю", "я"))
      }
    }
    // step 2: final и
    if (ends("и") && sufStart("и") >= rv) del("и")
    // step 3: derivational, in R2
    Seq("ость", "ост").find(ends).foreach { s =>
      if (sufStart(s) >= r2) del(s)
    }
    // step 4: undouble н / superlative / final ь
    if (ends("нн")) b.setLength(b.length - 1)
    else {
      Seq("ейше", "ейш").find(s => ends(s) && sufStart(s) >= rv) match {
        case Some(s) =>
          del(s)
          if (ends("нн")) b.setLength(b.length - 1)
        case None => if (ends("ь") && sufStart("ь") >= rv) del("ь")
      }
    }
    b.toString
  }
}
