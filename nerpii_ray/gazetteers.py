"""Gazetteer data for the from-scratch recognizers and pseudonym providers.

The sandbox ships none of the reference's model stack (presidio / spaCy /
transformers / faker / gender-guesser), so PERSON / LOCATION / ORGANIZATION
detection and pseudonym generation are driven by these word lists plus
heuristics (SURVEY.md §7).  The street-word deny list reproduces the
behaviour of the reference's custom ADDRESS recognizer
(``named_entity_recognizer.py:115-141``): a deny-list of address-related
words whose occurrence marks an ADDRESS mention.

All data here is plain public vocabulary (common given names, US states,
country names, …).  Lists are deliberately small — the engine's correctness
tests embed entities drawn from exactly these lists, so detection ground
truth is exact.
"""

from __future__ import annotations

# --- street words: the ADDRESS deny list (named_entity_recognizer.py:115-141) ---
STREET_WORDS = [
    "Street", "Rue", "Via", "Square", "Avenue", "Place", "Strada", "St",
    "Lane", "Road", "Boulevard", "Ln", "Rd", "HighwayDrive", "Av", "Hwy",
    "Blvd", "Corso", "Piazza", "Calle", "Plaza", "Avenida", "Rambla",
    "Vico", "C/",
]

# --- person names (gender split mirrors gender_guesser's buckets:
#     named_entity_recognizer.py:203-231 / faker_generator.py:198-263) ---
FIRST_NAMES_FEMALE = [
    "Mary", "Emma", "Olivia", "Sophia", "Isabella", "Hillary", "Alice",
    "Grace", "Laura", "Julia", "Clara", "Diana", "Elena", "Fiona", "Hannah",
    "Irene", "Karen", "Linda", "Maria", "Nina", "Paula", "Rachel", "Sara",
    "Teresa", "Valerie", "Wendy", "Chiara", "Giulia", "Francesca",
    "Patricia", "Jennifer", "Elizabeth", "Barbara", "Susan", "Jessica",
    "Sarah", "Lisa", "Nancy", "Betty", "Margaret", "Sandra", "Ashley",
    "Kimberly", "Emily", "Donna", "Michelle", "Carol", "Amanda", "Dorothy",
    "Melissa", "Deborah", "Stephanie", "Rebecca", "Sharon", "Cynthia",
    "Kathleen", "Amy", "Angela", "Shirley", "Anna", "Brenda", "Pamela",
    "Nicole", "Ruth", "Katherine", "Samantha", "Christine", "Catherine",
    "Janet", "Debra", "Carolyn", "Rachael", "Heather", "Diane", "Josephine",
    "Julie", "Joyce", "Victoria", "Kelly", "Christina", "Lauren", "Joan",
    "Evelyn", "Judith", "Megan", "Andrea", "Cheryl", "Hannelore", "Jacqueline",
    "Martha", "Gloria", "Teri", "Ann", "Simona", "Mitsue",
]
FIRST_NAMES_MALE = [
    "James", "John", "Robert", "Michael", "David", "George", "William",
    "Richard", "Thomas", "Charles", "Daniel", "Matthew", "Anthony", "Mark",
    "Paul", "Steven", "Andrew", "Kenneth", "Joshua", "Kevin", "Brian",
    "Edward", "Ronald", "Timothy", "Jason", "Jeffrey", "Frank", "Scott",
    "Eric", "Stephen", "Marco", "Luca", "Giovanni", "Andrea",
    "Christopher", "Joseph", "Donald", "Gary", "Nicholas", "Jonathan",
    "Larry", "Justin", "Benjamin", "Samuel", "Gregory", "Alexander",
    "Patrick", "Raymond", "Jack", "Dennis", "Jerry", "Tyler", "Aaron",
    "Jose", "Adam", "Nathan", "Henry", "Douglas", "Zachary", "Peter",
    "Kyle", "Noah", "Ethan", "Jeremy", "Walter", "Christian", "Keith",
    "Roger", "Terry", "Sean", "Gerald", "Carl", "Harold",
    "Dylan", "Arthur", "Lawrence", "Jordan", "Jesse", "Bryan", "Billy",
    "Bruce", "Gabriel", "Joe", "Logan", "Alan", "Juan", "Albert", "Willie",
    "Elijah", "Wayne", "Randy", "Vincent", "Mason", "Roy", "Ralph", "Bobby",
    "Russell", "Bradley", "Philip", "Eugene",
]
#: gender_guesser's full output vocabulary includes the mostly_* buckets
#: (named_entity_recognizer.py:222-231); these names are representative
#: members (our own assignments, not copied data) so the buckets actually
#: occur in enrichment output and flow through the gendered providers
FIRST_NAMES_MOSTLY_FEMALE = ["Shannon", "Jody", "Leslie", "Dana"]
FIRST_NAMES_MOSTLY_MALE = ["Kerry", "Loren", "Jan", "Maxime"]
FIRST_NAMES = (
    set(FIRST_NAMES_FEMALE)
    | set(FIRST_NAMES_MALE)
    | set(FIRST_NAMES_MOSTLY_FEMALE)
    | set(FIRST_NAMES_MOSTLY_MALE)
)
FIRST_NAME_GENDER = {n: "female" for n in FIRST_NAMES_FEMALE}
FIRST_NAME_GENDER.update({n: "male" for n in FIRST_NAMES_MALE})
FIRST_NAME_GENDER.update({n: "mostly_female" for n in FIRST_NAMES_MOSTLY_FEMALE})
FIRST_NAME_GENDER.update({n: "mostly_male" for n in FIRST_NAMES_MOSTLY_MALE})
# "andy" = androgynous in gender_guesser's vocabulary
FIRST_NAME_GENDER["Andrea"] = "andy"

LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "Martin", "Lee",
    "Thompson", "White", "Harris", "Clark", "Lewis", "Robinson", "Walker",
    "Hall", "Young", "King", "Wright", "Scott", "Green", "Baker", "Adams",
    "Nelson", "Hill", "Campbell", "Mitchell", "Roberts", "Carter",
    "Phillips", "Evans", "Turner", "Bush", "Clinton", "Obama", "Rossi",
    "Ferrari", "Russo", "Bianchi",
    "Perez", "Torres", "Parker", "Collins", "Edwards", "Stewart", "Flores",
    "Morris", "Nguyen", "Murphy", "Rivera", "Cook", "Rogers", "Morgan",
    "Peterson", "Cooper", "Reed", "Bailey", "Bell", "Gomez", "Kelly",
    "Howard", "Ward", "Cox", "Diaz", "Richardson", "Wood", "Watson",
    "Brooks", "Bennett", "Gray", "James", "Reyes", "Cruz", "Hughes",
    "Price", "Myers", "Long", "Foster", "Sanders", "Ross", "Morales",
    "Powell", "Sullivan", "Russell", "Ortiz", "Jenkins", "Gutierrez",
    "Perry", "Butler", "Barnes", "Fisher", "Henderson", "Coleman",
    "Simmons", "Patterson", "Jordan", "Reynolds", "Hamilton", "Graham",
    "Kim", "Wallace", "Moreno", "West", "Cole", "Hayes", "Bryant",
    "Herrera", "Gibson", "Ellis", "Tran", "Medina", "Aguilar", "Stevens",
    "Murray", "Ford", "Castro", "Marshall", "Owens", "Harrison",
]
LAST_NAME_SET = set(LAST_NAMES)

# --- locations ---
CITIES = [
    "New York", "Chicago", "Phoenix", "Los Angeles", "Houston", "Boston",
    "Seattle", "Denver", "Atlanta", "Miami", "Dallas", "Detroit",
    "Portland", "Austin", "Milan", "Rome", "Turin", "Naples", "London",
    "Paris", "Berlin", "Madrid", "Vienna", "Dublin", "Lisbon", "Oslo",
    "San Francisco", "Las Vegas", "New Orleans", "Salt Lake City",
]
US_STATES = [
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
]
US_STATE_ABBR = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY",
]
COUNTRIES = [
    "United Kingdom", "United States", "Hungary", "Italy", "France",
    "Germany", "Spain", "Portugal", "Ireland", "Norway", "Sweden",
    "Finland", "Denmark", "Poland", "Austria", "Switzerland", "Belgium",
    "Netherlands", "Greece", "Turkey", "Japan", "China", "India", "Brazil",
    "Canada", "Mexico", "Australia", "New Zealand", "South Africa",
    "Argentina", "Chile", "Egypt", "Kenya", "Morocco",
]
LOCATIONS = set(CITIES) | set(US_STATES) | set(COUNTRIES)
LOCATION_UNIGRAMS = {w for w in LOCATIONS if " " not in w}
LOCATION_BIGRAMS = {w for w in LOCATIONS if w.count(" ") >= 1}
#: state abbreviations recognized as LOCATION when they appear as
#: uppercase 2-letter tokens; ambiguous English words excluded
US_STATE_ABBR_SAFE = set(US_STATE_ABBR) - {"IN", "OR", "ME", "OK", "HI", "ID"}

# --- organizations (stand-in for the HF BERT NER stage,
#     named_entity_recognizer.py:387-405, 491-521) ---
ORG_KEYWORDS = {
    "University", "Institute", "Inc", "Corp", "Corporation", "LLC", "Ltd",
    "Labs", "Technologies", "Group", "Bank", "Company", "Foundation",
    "Agency", "Department", "Systems", "Industries", "Holdings",
}
ORG_NAMES = [
    "Acme Corp", "Globex Corporation", "Initech LLC", "Umbrella Group",
    "Stark Industries", "Wayne Enterprises Inc", "Cyberdyne Systems",
    "Tyrell Corp", "Wonka Industries", "Hooli Inc", "Pied Piper LLC",
    "Vandelay Industries", "Oscorp Inc", "Massive Dynamic Group",
    "Aperture Labs", "Black Mesa Institute", "Soylent Corp",
    "Weyland Group", "Gekko Holdings", "Duff Corporation",
]

# --- stopwords for language-ID / quality scoring (documents table) ---
STOPWORDS = {
    "en": {"the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
           "for", "on", "with", "as", "at", "by", "or", "be", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "por", "con", "para", "es", "al", "lo", "como", "mas"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
           "que", "qui", "dans", "pour", "est", "pas", "sur", "au"},
    "it": {"il", "la", "di", "che", "e", "in", "un", "una", "per", "con",
           "del", "della", "sono", "non", "al", "si", "da", "come"},
}

# --- pseudonym-provider vocab (deterministic Faker analogue, SURVEY §2.5) ---
EMAIL_DOMAINS = ["example.com", "mail.test", "inbox.example", "post.example"]
STREET_NAMES = [
    "Maple", "Oak", "Cedar", "Elm", "Pine", "Walnut", "Chestnut", "Willow",
    "Birch", "Sunset", "Hillcrest", "Lakeview", "Meadow", "Ridge", "Park",
]

# --- Italian-locale provider vocab: the Faker(["it_IT"]) analogue
#     (faker_generator.py:84-87 switches every provider to the Italian
#     locale when lang == "it"; :476-513 uses postcode() over zipcode()) ---
IT_FIRST_NAMES_FEMALE = [
    "Giulia", "Francesca", "Chiara", "Sofia", "Martina", "Sara", "Alessia",
    "Elena", "Valentina", "Giorgia", "Beatrice", "Alice", "Federica",
    "Silvia", "Elisa", "Ilaria", "Roberta", "Simona", "Paola", "Laura",
]
IT_FIRST_NAMES_MALE = [
    "Marco", "Luca", "Giuseppe", "Francesco", "Alessandro", "Andrea",
    "Matteo", "Lorenzo", "Davide", "Simone", "Federico", "Riccardo",
    "Stefano", "Giovanni", "Antonio", "Paolo", "Pietro", "Salvatore",
    "Vincenzo", "Emanuele",
]
IT_LAST_NAMES = [
    "Rossi", "Russo", "Ferrari", "Esposito", "Bianchi", "Romano",
    "Colombo", "Ricci", "Marino", "Greco", "Bruno", "Gallo", "Conti",
    "De Luca", "Mancini", "Costa", "Giordano", "Rizzo", "Lombardi",
    "Moretti",
]
IT_CITIES = [
    "Milano", "Roma", "Napoli", "Torino", "Palermo", "Genova", "Bologna",
    "Firenze", "Bari", "Catania", "Venezia", "Verona", "Messina", "Padova",
    "Trieste", "Brescia", "Parma", "Modena", "Perugia", "Cagliari",
]
IT_STREET_NAMES = [
    "Roma", "Garibaldi", "Dante", "Mazzini", "Cavour", "Verdi", "Marconi",
    "Gramsci", "Manzoni", "Leopardi", "Galilei", "Colombo", "Veneto",
]
IT_STREET_PREFIXES = ["Via", "Piazza", "Corso", "Viale"]
IT_REGIONS = [
    "Lombardia", "Lazio", "Campania", "Sicilia", "Veneto",
    "Emilia-Romagna", "Piemonte", "Puglia", "Toscana", "Calabria",
    "Sardegna", "Liguria", "Marche", "Abruzzo", "Umbria",
]
IT_PROVINCE_ABBR = [
    "MI", "RM", "NA", "TO", "PA", "GE", "BO", "FI", "BA", "CT", "VE",
    "VR", "ME", "PD", "TS", "BS", "PR", "MO", "PG", "CA",
]
IT_COUNTRIES = [
    "Italia", "Francia", "Germania", "Spagna", "Regno Unito", "Portogallo",
    "Svizzera", "Austria", "Grecia", "Paesi Bassi", "Belgio", "Irlanda",
    "Norvegia", "Svezia", "Polonia", "Ungheria",
]
IT_EMAIL_DOMAINS = ["esempio.it", "posta.it", "esempio.com", "mail.it"]

# --- Italian DETECTION gazetteers (lang="it") ------------------------
# The reference swaps its whole NLP engine to ``it_core_news_lg`` when
# ``lang == "it"`` (``named_entity_recognizer.py:338-341, 359-370``).
# Here the same knob widens the detection vocabulary: lang="it" scans
# with the UNION of the English and Italian surface sets (an Italian
# statistical model still recognizes "John Smith"; a union preserves
# English recall while adding the Italian surfaces, and is deterministic
# where the model swap is not).

#: org keywords the BERT-stage analogue extends spans around; ASCII-safe
#: plus the accented forms the it token regex can see
IT_ORG_KEYWORDS = {
    "SpA", "Srl", "Banca", "Universita", "Università", "Istituto",
    "Gruppo", "Societa", "Società", "Fondazione", "Agenzia",
    "Dipartimento", "Assicurazioni", "Officine", "Consorzio",
}
#: province abbreviations recognized as LOCATION when uppercase; "TO"
#: and "ME" excluded — both are common words in all-caps text (cf. the
#: US_STATE_ABBR_SAFE exclusions above)
IT_PROVINCE_ABBR_SAFE = set(IT_PROVINCE_ABBR) - {"TO", "ME"}

# gender_guesser's dictionary is multilingual and the reference calls it
# without a country argument (named_entity_recognizer.py:203-231), so
# Italian names carry their gender REGARDLESS of cfg.lang: merge them
# into the global map.  "Andrea" stays "andy" (what gender_guesser
# returns — male in Italian, female in German).
for _n in IT_FIRST_NAMES_FEMALE:
    FIRST_NAME_GENDER.setdefault(_n, "female")
for _n in IT_FIRST_NAMES_MALE:
    if _n != "Andrea":
        FIRST_NAME_GENDER.setdefault(_n, "male")


class DetectionSets:
    """Per-language surface sets the compiled registry scans with."""

    __slots__ = (
        "first_names", "last_names", "loc_unigrams", "loc_bigrams",
        "state_abbr", "org_keywords",
    )

    def __init__(self, first_names, last_names, loc_unigrams, loc_bigrams,
                 state_abbr, org_keywords):
        self.first_names = first_names
        self.last_names = last_names
        self.loc_unigrams = loc_unigrams
        self.loc_bigrams = loc_bigrams
        self.state_abbr = state_abbr
        self.org_keywords = org_keywords


_DETECTION_CACHE: dict = {}


def detection_sets(lang: str = "en") -> DetectionSets:
    """Surface sets for ``RecognizerRegistry(lang=...)``.

    ``"en"`` returns exactly the module-level English sets (bit-stable
    with pre-lang behaviour); ``"it"`` unions in the Italian pools the
    synthesizer already owns (names, cities, regioni, countries,
    province sigle, org keywords).  Multi-word surnames ("De Luca")
    contribute their final token — the token scan is unigram-keyed and
    "Luca" is independently a PERSON surface.
    """
    if lang in _DETECTION_CACHE:
        return _DETECTION_CACHE[lang]
    first = set(FIRST_NAMES)
    last = set(LAST_NAME_SET)
    uni = set(LOCATION_UNIGRAMS)
    bi = set(LOCATION_BIGRAMS)
    abbr = set(US_STATE_ABBR_SAFE)
    org = set(ORG_KEYWORDS)
    if lang == "it":
        first |= set(IT_FIRST_NAMES_FEMALE) | set(IT_FIRST_NAMES_MALE)
        last |= {s.split()[-1] for s in IT_LAST_NAMES}
        it_locs = set(IT_CITIES) | set(IT_REGIONS) | set(IT_COUNTRIES)
        uni |= {w for w in it_locs if " " not in w}
        bi |= {w for w in it_locs if " " in w}
        abbr |= IT_PROVINCE_ABBR_SAFE
        org |= IT_ORG_KEYWORDS
    elif lang != "en":
        raise ValueError(f"unsupported lang: {lang!r} (expected 'en' or 'it')")
    out = DetectionSets(first, last, uni, bi, abbr, org)
    _DETECTION_CACHE[lang] = out
    return out
URL_WORDS = [
    "horizon", "cobalt", "meadow", "lattice", "quarry", "harbor", "summit",
    "prairie", "glacier", "canyon",
]
TLDS = ["com", "org", "net", "info"]
