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
