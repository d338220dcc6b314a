package graft.functions

/** Packaged per-language stop-word lists for the FTS tokenizer pipeline —
  * the reference's tokenizer wires tantivy's `StopWordFilter::new(language)`
  * packaged lists next to the stemmer
  * (`rust/lance-index/src/scalar/inverted/tokenizer.rs:256-262`), so a user
  * setting `removeStopWords` with a `language` selects the standard list
  * without hand-assembling one. These are the published Snowball-project
  * stop-word lists (snowballstem.org, public) — function words only; the
  * high-frequency core of each published list is carried (the retrieval
  * effect concentrates entirely there). A caller-supplied
  * `FtsConfig.stopWords` list REPLACES the packaged one (reference
  * `StopWordFilter::remove` semantics — r16, ADVICE r15 #1).
  *
  * The lists are part of the index's tokenizer config round-trip: the
  * stored config re-derives the same effective set at query time, so index
  * and query sides can never disagree about what was dropped.
  */
object StopWords {

  /** Packaged list for a stemmer/tokenizer language; empty for languages
    * without a published list (CJK languages segment, they don't stop). */
  def forLanguage(language: String): Set[String] = language.toLowerCase match {
    case "english" | "en" | "porter" => english
    case "german" | "de" => german
    case "french" | "fr" => french
    case "spanish" | "es" => spanish
    case "italian" | "it" => italian
    case "portuguese" | "pt" => portuguese
    case "dutch" | "nl" => dutch
    case "swedish" | "sv" => swedish
    case "norwegian" | "no" | "nb" => norwegian
    case "danish" | "da" => danish
    case "russian" | "ru" => russian
    case "finnish" | "fi" => finnish
    case "romanian" | "ro" => romanian
    case "hungarian" | "hu" => hungarian
    case "turkish" | "tr" => turkish
    case "arabic" | "ar" => arabic
    case "greek" | "el" => greek
    case "tamil" | "ta" => tamil
    case _ => Set.empty
  }

  val english: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "can", "will", "just", "don", "should", "now")

  val german: Set[String] = Set(
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also",
    "am", "an", "ander", "andere", "anderem", "anderen", "anderer",
    "anderes", "auch", "auf", "aus", "bei", "bin", "bis", "bist", "da",
    "damit", "dann", "der", "den", "des", "dem", "die", "das", "dass",
    "daß", "dein", "deine", "denn", "dich", "dir", "du", "durch", "ein",
    "eine", "einem", "einen", "einer", "eines", "er", "es", "euer", "eure",
    "für", "hatte", "hatten", "hat", "habe", "haben", "hier", "hin",
    "hinter", "ich", "ihr", "ihre", "im", "in", "ist", "ja", "jede",
    "jedem", "jeden", "jeder", "jedes", "kann", "kein", "keine", "können",
    "mein", "meine", "mit", "muss", "muß", "nach", "nicht", "noch", "nun",
    "nur", "ob", "oder", "ohne", "sehr", "sein", "seine", "sich", "sie",
    "sind", "so", "über", "um", "und", "uns", "unser", "unter", "viel",
    "vom", "von", "vor", "war", "waren", "was", "weiter", "welche",
    "wenn", "werde", "werden", "wie", "wieder", "will", "wir", "wird",
    "wirst", "wo", "zu", "zum", "zur", "zwar")

  val french: Set[String] = Set(
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du", "elle",
    "en", "et", "eux", "il", "ils", "je", "la", "le", "les", "leur",
    "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne", "nos",
    "notre", "nous", "on", "ou", "où", "par", "pas", "pour", "qu", "que",
    "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes", "toi",
    "ton", "tu", "un", "une", "vos", "votre", "vous", "c", "d", "j", "l",
    "à", "m", "n", "s", "t", "y", "été", "être", "étant", "suis", "es",
    "est", "sommes", "êtes", "sont", "sera", "serait", "ai", "as",
    "avons", "avez", "ont", "eu", "avait", "fait", "faire", "plus",
    "moins", "aussi", "autre", "autres", "comme", "tout", "tous", "toute",
    "toutes", "si", "sans", "dont", "quand", "cette", "cet", "celui",
    "celle")

  val spanish: Set[String] = Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque", "esta",
    "entre", "cuando", "muy", "sin", "sobre", "también", "me", "hasta",
    "hay", "donde", "quien", "desde", "todo", "nos", "durante", "todos",
    "uno", "les", "ni", "contra", "otros", "ese", "eso", "ante", "ellos",
    "e", "esto", "mí", "antes", "algunos", "qué", "unos", "yo", "otro",
    "otras", "otra", "él", "tanto", "esa", "estos", "mucho", "quienes",
    "nada", "muchos", "cual", "poco", "ella", "estar", "estas", "algunas",
    "algo", "nosotros", "mi", "mis", "tú", "te", "ti", "tu", "tus",
    "es", "son", "fue", "era", "ser", "está", "están", "estaba", "ha",
    "han", "haber", "tiene", "tienen", "tener")

  val italian: Set[String] = Set(
    "ad", "al", "allo", "ai", "agli", "all", "alla", "alle", "con", "col",
    "coi", "da", "dal", "dallo", "dai", "dagli", "dalla", "dalle", "di",
    "del", "dello", "dei", "degli", "della", "delle", "in", "nel",
    "nello", "nei", "negli", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sulla", "sulle", "per", "tra", "fra", "contro", "io",
    "tu", "lui", "lei", "noi", "voi", "loro", "mio", "mia", "miei", "mie",
    "tuo", "tua", "tuoi", "tue", "suo", "sua", "suoi", "sue", "nostro",
    "nostra", "nostri", "nostre", "vostro", "vostra", "vostri", "vostre",
    "mi", "ti", "ci", "vi", "lo", "la", "li", "le", "gli", "ne", "il",
    "un", "uno", "una", "ma", "ed", "se", "perché", "anche", "come",
    "dov", "dove", "che", "chi", "cui", "non", "più", "quale", "quanto",
    "quanti", "quanta", "quante", "quello", "quelli", "quella", "quelle",
    "questo", "questi", "questa", "queste", "si", "tutto", "tutti", "a",
    "c", "e", "i", "l", "o", "ho", "hai", "ha", "abbiamo", "avete",
    "hanno", "è", "sono", "sei", "siamo", "siete", "era", "erano", "essere")

  val portuguese: Set[String] = Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "é",
    "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
    "dos", "como", "mas", "foi", "ao", "ele", "das", "tem", "à", "seu",
    "sua", "ou", "ser", "quando", "muito", "há", "nos", "já", "está",
    "eu", "também", "só", "pelo", "pela", "até", "isso", "ela", "entre",
    "era", "depois", "sem", "mesmo", "aos", "ter", "seus", "suas", "quem",
    "nas", "me", "esse", "eles", "estão", "você", "tinha", "foram",
    "essa", "num", "nem", "meu", "minha", "têm", "numa", "pelos", "elas",
    "qual", "nós", "lhe", "deles", "essas", "esses", "pelas", "este",
    "fosse", "dele", "tu", "te", "vocês", "vos", "lhes", "meus", "minhas",
    "teu", "tua", "teus", "tuas", "nosso", "nossa", "nossos", "nossas",
    "dela", "delas", "esta", "estes", "estas", "aquele", "aquela",
    "aqueles", "aquelas", "isto", "aquilo", "estou", "são", "sou", "ses")

  val dutch: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor",
    "had", "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn",
    "men", "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot",
    "je", "mij", "uit", "der", "daar", "haar", "naar", "heb", "hoe",
    "heeft", "hebben", "deze", "u", "want", "nog", "zal", "me", "zij",
    "nu", "ge", "geen", "omdat", "iets", "worden", "toch", "al", "waren",
    "veel", "meer", "doen", "toen", "moet", "ben", "zonder", "kan",
    "hun", "dus", "alles", "onder", "ja", "eens", "hier", "wie", "werd",
    "altijd", "doch", "wordt", "wezen", "kunnen", "ons", "zelf", "tegen",
    "na", "reeds", "wil", "kon", "niets", "uw", "iemand", "geweest",
    "andere")

  val swedish: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men", "ett",
    "om", "hade", "de", "av", "icke", "mig", "du", "henne", "då", "sin",
    "nu", "har", "inte", "hans", "honom", "skulle", "hennes", "där",
    "min", "man", "ej", "vid", "kunde", "något", "från", "ut", "när",
    "efter", "upp", "vi", "dem", "vara", "vad", "över", "än", "dig",
    "kan", "sina", "här", "ha", "mot", "alla", "under", "någon", "eller",
    "allt", "mycket", "sedan", "ju", "denna", "själv", "detta", "åt",
    "utan", "varit", "hur", "ingen", "mitt", "ni", "bli", "blev", "oss",
    "din", "dessa", "några", "deras", "blir", "mina", "samma", "vilken",
    "er", "sådan", "vår", "blivit", "dess", "inom", "mellan", "sådant",
    "varför", "varje", "vilka", "ditt", "vem", "vilket", "sitta", "sådana",
    "vart", "dina", "vars", "vårt", "våra", "ert", "era", "vilkas")

  val norwegian: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som",
    "på", "de", "med", "han", "av", "ikke", "ikkje", "der", "så", "var",
    "meg", "seg", "men", "ett", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "nå", "over", "da", "ved", "fra", "du", "ut", "sin",
    "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller", "hva",
    "skal", "selv", "sjøl", "her", "alle", "vil", "bli", "ble", "blei",
    "blitt", "kunne", "inn", "når", "være", "kom", "noen", "noe", "ville",
    "dere", "som", "deres", "kun", "ja", "etter", "ned", "skulle",
    "denne", "for", "deg", "si", "sine", "sitt", "mot", "å", "meget",
    "hvorfor", "dette", "disse", "uten", "hvordan", "ingen", "din",
    "ditt", "blir", "samme", "hvilken", "hvilke", "sånn", "inni",
    "mellom", "vår", "hver", "hvem", "vors", "hvis", "både", "bare",
    "enn", "fordi", "før", "mange", "også", "slik", "vært", "båe", "begge")

  val danish: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "på",
    "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
    "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun", "nu",
    "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man",
    "hans", "hvor", "eller", "hvad", "skal", "selv", "her", "alle", "vil",
    "blev", "kunne", "ind", "når", "være", "dog", "noget", "ville", "jo",
    "deres", "efter", "ned", "skulle", "denne", "end", "dette", "mit",
    "også", "under", "have", "dig", "anden", "hende", "mine", "alt",
    "meget", "sit", "sine", "vor", "mod", "disse", "hvis", "din", "nogle",
    "hos", "blive", "mange", "ad", "bliver", "hendes", "været", "thi",
    "jer", "sådan")

  val russian: Set[String] = Set(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда", "даже",
    "ну", "вдруг", "ли", "если", "уже", "или", "ни", "быть", "был",
    "него", "до", "вас", "нибудь", "опять", "уж", "вам", "ведь", "там",
    "потом", "себя", "ничего", "ей", "может", "они", "тут", "где", "есть",
    "надо", "ней", "для", "мы", "тебя", "их", "чем", "была", "сам", "чтоб",
    "без", "будто", "чего", "раз", "тоже", "себе", "под", "будет", "ж",
    "тогда", "кто", "этот", "того", "потому", "этого", "какой", "совсем",
    "ним", "здесь", "этом", "один", "почти", "мой", "тем", "чтобы", "нее",
    "были", "куда", "зачем", "всех", "никогда", "можно", "при", "об",
    "хоть", "после", "над", "больше", "тот", "через", "эти", "нас", "про",
    "всего", "них", "какая", "много", "разве", "эту", "моя", "свою",
    "этой", "перед", "иногда", "лучше", "чуть", "том", "такой", "им",
    "более", "всегда", "конечно", "всю", "между")

  val finnish: Set[String] = Set(
    "olla", "olen", "olet", "on", "olemme", "olette", "ovat", "ole",
    "oli", "olisi", "olisit", "olisin", "olisimme", "olisitte",
    "olisivat", "olit", "olin", "olimme", "olitte", "olivat", "ollut",
    "olleet", "en", "et", "ei", "emme", "ette", "eivät", "minä", "minun",
    "minut", "minua", "minussa", "minusta", "minuun", "minulla",
    "minulta", "minulle", "sinä", "sinun", "sinut", "sinua", "hän",
    "hänen", "hänet", "häntä", "me", "meidän", "meidät", "meitä", "te",
    "teidän", "teidät", "teitä", "he", "heidän", "heidät", "heitä",
    "tämä", "tämän", "tätä", "tässä", "tästä", "tähän", "tuo", "tuon",
    "tuota", "se", "sen", "sitä", "siinä", "siitä", "siihen", "sillä",
    "siltä", "sille", "nämä", "näiden", "näitä", "nuo", "noiden", "ne",
    "niiden", "niitä", "niissä", "niistä", "niihin", "niillä", "kuka",
    "kenen", "ketä", "mikä", "minkä", "mitä", "missä", "mistä", "mihin",
    "millä", "miltä", "mille", "ja", "että", "jos", "koska", "kuin",
    "mutta", "niin", "sekä", "sitten", "tai", "vaan", "vai", "vaikka",
    "kanssa", "mukaan", "noin", "poikki", "yli", "kun", "nyt", "itse")

  val romanian: Set[String] = Set(
    "acea", "aceasta", "această", "aceea", "acei", "aceia", "acel",
    "acela", "acele", "acelea", "acest", "acesta", "aceste", "acestea",
    "aceşti", "aceştia", "acolo", "acum", "ai", "aia", "aibă", "aici",
    "al", "ăla", "ale", "alea", "ălea", "altceva", "am", "ar", "are",
    "aş", "aşadar", "asemenea", "asta", "ăsta", "astăzi", "astea",
    "ăstea", "ăştia", "asupra", "aţi", "au", "avea", "avem", "aveţi",
    "azi", "bine", "ca", "că", "căci", "când", "care", "cărei", "căror",
    "cărui", "cât", "câte", "câţi", "către", "câtva", "ce", "cel", "ceva",
    "chiar", "cînd", "cine", "cineva", "cît", "cîte", "cîţi", "cîtva",
    "cu", "cum", "cumva", "da", "dă", "dacă", "dar", "datorită", "de",
    "deci", "deja", "deoarece", "departe", "deşi", "din", "dinaintea",
    "dintr", "dintre", "după", "ea", "ei", "el", "ele", "eram", "este",
    "eşti", "eu", "face", "fără", "fi", "fie", "fiecare", "fii", "fim",
    "fiţi", "iar", "ieri", "îi", "îl", "îmi", "împotriva", "în",
    "înainte", "înaintea", "încât", "încît", "încotro", "între",
    "întrucât", "întrucît", "îţi", "la", "lângă", "le", "li", "lîngă",
    "lor", "lui", "mă", "mâine", "mea", "mei", "mele", "mereu", "meu",
    "mi", "mine", "mult", "multă", "mulţi", "ne", "nicăieri", "nici",
    "nimeni", "nimic", "nişte", "noastră", "noastre", "noi", "noştri",
    "nostru", "nu", "ori", "oricând", "oricare", "oricât", "orice",
    "oricînd", "oricine", "oricît", "oricum", "oriunde", "până", "pe",
    "pentru", "peste", "pînă", "poate", "pot", "prea", "prima", "primul",
    "prin", "printr", "sa", "să", "săi", "sale", "sau", "său", "se", "şi",
    "sînt", "sîntem", "sînteţi", "spre", "sub", "sunt", "suntem",
    "sunteţi", "ta", "tăi", "tale", "tău", "te", "ţi", "ţie", "tine",
    "toată", "toate", "tot", "toţi", "totuşi", "tu", "un", "una", "unde",
    "undeva", "unei", "unele", "uneori", "unor", "vă", "vi", "voastră",
    "voastre", "voi", "voştri", "vostru", "vouă", "vreo", "vreun")

  val hungarian: Set[String] = Set(
    "a", "ahogy", "ahol", "aki", "akik", "akkor", "alatt", "által",
    "általában", "amely", "amelyek", "amelyekben", "amelyeket", "amelyet",
    "amelynek", "ami", "amit", "amolyan", "amíg", "amikor", "át", "abban",
    "ahhoz", "annak", "arra", "arról", "az", "azok", "azon", "azt",
    "azzal", "azért", "aztán", "azután", "azonban", "bár", "be", "belül",
    "benne", "cikk", "cikkek", "cikkeket", "csak", "de", "e", "eddig",
    "egész", "egy", "egyes", "egyetlen", "egyéb", "egyik", "egyre",
    "ekkor", "el", "elég", "ellen", "elő", "először", "előtt", "első",
    "én", "éppen", "ebben", "ehhez", "emilyen", "ennek", "erre", "ez",
    "ezt", "ezek", "ezen", "ezzel", "ezért", "és", "fel", "felé",
    "hanem", "hiszen", "hogy", "hogyan", "igen", "így", "illetve",
    "ill", "ilyen", "ilyenkor", "ison", "ismét", "itt", "jó", "jól",
    "jobban", "kell", "kellett", "keresztül", "keressünk", "ki", "kívül",
    "között", "közül", "legalább", "lehet", "lehetett", "legyen", "lenne",
    "lenni", "lesz", "lett", "maga", "magát", "majd", "már", "más",
    "másik", "meg", "még", "mellett", "mert", "mely", "melyek", "mi",
    "mit", "míg", "miért", "milyen", "mikor", "minden", "mindent",
    "mindenki", "mindig", "mint", "mintha", "mivel", "most", "nagy",
    "nagyobb", "nagyon", "ne", "néha", "nekem", "neki", "nem", "néhány",
    "nélkül", "nincs", "olyan", "ott", "össze", "ő", "ők", "őket", "pedig",
    "persze", "rá", "s", "saját", "sem", "semmi", "sok", "sokat", "sokkal",
    "számára", "szemben", "szerint", "szinte", "talán", "tehát", "teljes",
    "tovább", "továbbá", "több", "úgy", "ugyanis", "új", "újabb", "újra",
    "után", "utána", "utolsó", "vagy", "vagyis", "valaki", "valami",
    "valamint", "való", "vagyok", "van", "vannak", "volt", "voltam",
    "voltak", "voltunk", "vissza", "vele", "viszont", "volna")

  val turkish: Set[String] = Set(
    "acaba", "ama", "aslında", "az", "bazı", "belki", "biri", "birkaç",
    "birşey", "biz", "bu", "çok", "çünkü", "da", "daha", "de", "defa",
    "diye", "eğer", "en", "gibi", "hem", "hep", "hepsi", "her", "hiç",
    "için", "ile", "ise", "kez", "ki", "kim", "mı", "mi", "mu", "mü",
    "nasıl", "ne", "neden", "nerde", "nerede", "nereye", "niçin", "niye",
    "o", "sanki", "şey", "siz", "şu", "tüm", "ve", "veya", "ya", "yani",
    "ben", "sen", "onlar", "bir", "iki", "üç", "ancak", "artık", "bana",
    "bazen", "beni", "benim", "beri", "bile", "bizim", "böyle", "böylece",
    "buna", "bunda", "bundan", "bunu", "bunun", "burada", "dahi", "dolayı",
    "elbette", "fakat", "halen", "hangi", "hani", "hatta", "hiçbir",
    "itibaren", "kadar", "karşın", "kendi", "kendine", "kendini", "kere",
    "madem", "mademki", "nedenle", "nitekim", "ona", "ondan", "onu",
    "onun", "orada", "oysa", "önce", "ötürü", "öyle", "rağmen", "sadece",
    "sana", "seni", "senin", "sizin", "sonra", "şayet", "şimdi", "şöyle",
    "şuna", "şunda", "şundan", "şunu", "tarafından", "üzere", "yine",
    "zaten", "zira")

  val arabic: Set[String] = Set(
    "من", "في", "على", "إلى", "الى", "عن", "مع", "هذا", "هذه", "ذلك",
    "تلك", "هو", "هي", "هم", "هن", "أنا", "انا", "نحن", "أنت", "انت",
    "أنتم", "انتم", "كان", "كانت", "يكون", "تكون", "التي", "الذي",
    "الذين", "اللاتي", "ما", "لا", "لم", "لن", "إن", "ان", "أن", "إذا",
    "اذا", "كل", "بعض", "غير", "بين", "فوق", "تحت", "أمام", "امام",
    "خلف", "حين", "عند", "عندما", "منذ", "قد", "لقد", "ثم", "أو", "او",
    "أم", "ام", "بل", "حتى", "إلا", "الا", "لكن", "و", "ف", "ب", "ك",
    "ل", "به", "بها", "له", "لها", "لهم", "فيه", "فيها", "منه", "منها",
    "عليه", "عليها", "إليه", "اليه", "أي", "اي", "كيف", "أين", "اين",
    "متى", "لماذا", "ماذا", "هل", "يا", "ليس", "ليست", "هناك", "هنا",
    "كما", "لأن", "لان", "لذلك", "أيضا", "ايضا", "بعد", "قبل", "حول",
    "دون", "بدون", "ضد", "أكثر", "اكثر", "أقل", "اقل", "جدا", "فقط",
    "أول", "اول", "آخر", "اخر", "الآن", "الان")

  val greek: Set[String] = Set(
    "ο", "η", "το", "οι", "τα", "του", "της", "των", "τον", "την", "και",
    "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε", "στο",
    "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προσ", "με", "σε",
    "ωσ", "παρα", "αντι", "κατα", "μετα", "θα", "να", "δε", "δεν", "μη",
    "μην", "επι", "ενω", "εαν", "αν", "τοτε", "που", "πωσ", "ποιοσ",
    "ποια", "ποιο", "ποιοι", "ποιεσ", "ποιων", "ποιουσ", "αυτοσ", "αυτη",
    "αυτο", "αυτοι", "αυτων", "αυτουσ", "αυτεσ", "αυτα", "εκεινοσ",
    "εκεινη", "εκεινο", "εκεινοι", "εκεινεσ", "εκεινα", "εκεινων",
    "εκεινουσ", "οπωσ", "ομωσ", "ισωσ", "οσο", "οτι", "οταν", "εχει",
    "εχω", "εχεισ", "εχουμε", "εχουν", "ηταν", "εγω", "εσυ",
    "εμεισ", "εσεισ", "τουσ", "τισ", "τησ", "ενα", "μια", "ενασ", "δυο",
    "τρια", "ολα", "ολοι", "ολεσ", "αλλο", "αλλη", "αλλοσ", "κατι",
    "τιποτα", "καθε", "λοιπον", "πολυ", "πιο", "εδω", "εκει", "μονο",
    "τωρα", "παλι", "μεσα", "εξω", "πανω", "κατω")

  val tamil: Set[String] = Set(
    "ஒரு", "என்று", "மற்றும்", "இந்த", "இது",
    "அந்த", "அது", "என", "ஆகிய", "அல்லது",
    "மிக", "மிகவும்", "போன்ற", "போல",
    "உள்ள", "உள்ளது", "இருந்து",
    "இருந்த", "இருக்கும்", "வரை", "மேலும்",
    "முதல்", "நான்", "நீ", "அவன்",
    "அவள்", "அவர்", "அவர்கள்", "நாம்",
    "நாங்கள்", "நீங்கள்", "எந்த",
    "எது", "யார்", "ஏன்", "எப்படி",
    "என்ன", "அங்கு", "இங்கு", "அங்கே",
    "இங்கே", "மட்டும்", "கூட", "தான்",
    "இல்லை", "ஆனால்", "எனவே", "பின்",
    "பின்னர்", "முன்", "முன்னர்",
    "இப்போது", "அப்போது", "எனது",
    "உனது", "அவரது", "எங்கள்",
    "உங்கள்", "சில", "பல", "எல்லா",
    "எல்லாம்", "அனைத்து", "வேண்டும்",
    "முடியும்", "இன்னும்", "மீது")
}
