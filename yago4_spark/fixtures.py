"""Deterministic synthetic fixtures (seed-free: the universe is written
out literally, so it is bit-stable across runs by construction).

Implements FIXTURES.md §1-§3: the mini-Wikidata statements slice
exercising every taxonomy/URI/facts rule, the interleaved documents
table (BASELINE.json input_hint shape), and the entity-linking QID
dictionary. No external data.

The QID universe (all rules it exercises cite /root/reference):

Classes (wdt:P279 edges; schema fromClass: Q5→Person, Q618123→Place,
Q17537576→CreativeWork, Q43229→Organization, Q35120→Thing):
  Q1000 ⊂ Q5, Q35120   "Scientist"    3 inst, enwiki — kept; the double
                       parentage exercises transitive reduction
                       (plan.rs:617-638: Person ⊂ Thing makes the
                       Q1000→Thing edge redundant)
  Q1001 ⊂ Q1000        "Physicist"    2 inst, enwiki — kept (chain depth 2)
  Q1002 ⊂ Q1001        "Astro"        1 inst — below threshold, dropped
  Q1100 ⊂ Q1101, Q5    "CycleA"       2 inst, enwiki — kept; cycle member
  Q1101 ⊂ Q1100        "CycleB"       2 inst, enwiki — kept (cycle, must
                       terminate: plan.rs:2252-2268 visited-set BFS)
  Q1200 ⊂ Q4167410, Q17537576  "BadSub"  5 inst, enwiki — under bad class
                       (plan.rs:44-51) — excluded with instances
  Q1300 ⊂ Q5, Q17537576  "DisjointSub"  2 inst, enwiki — under the
                       disjoint Person×CreativeWork pair — excluded
  Q1400 ⊂ Q618123      "Villagetype"  2 inst, label only (NO enwiki) —
                       kept for instance extraction but NOT a yago class
                       (plan.rs:546-556); maps to schema:Place
  Q1500 ⊂ Q9999        "Orphan"       3 inst — not under any mapped
                       class, dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import terms, vocab
from .terms import (
    blank,
    date_time,
    decimal,
    integer,
    iri,
    item,
    lang_string,
    prop,
    string,
)

WDT = "http://www.wikidata.org/prop/direct/P"
P = "http://www.wikidata.org/prop/P"
PS = "http://www.wikidata.org/prop/statement/P"
PSV = "http://www.wikidata.org/prop/statement/value/P"
PQ = "http://www.wikidata.org/prop/qualifier/P"
PQV = "http://www.wikidata.org/prop/qualifier/value/P"
WDV = "http://www.wikidata.org/value/"

RDF_TYPE = iri(vocab.RDF_TYPE)
ENWIKI = "https://en.wikipedia.org/wiki/"

# hub entity for skew tests: the Q5-analog with many instances
HUB_CLASS = 5
HUB_INSTANCE_COUNT = 40


def mini_wikidata_triples() -> list[tuple[dict, dict, dict]]:
    t: list[tuple[dict, dict, dict]] = []

    def add(s, p, o):
        t.append((s, p, o))

    def p279(child: int, parent: int):
        add(item(child), prop(279), item(parent))

    def p31(inst: int, cls: int):
        add(item(inst), prop(31), item(cls))

    def sitelink(title: str, qid: int, wiki: str = ENWIKI):
        add(iri(wiki + title), iri(vocab.SCHEMA_ABOUT), item(qid))

    def label(qid: int, text: str, lang: str = "en"):
        add(item(qid), iri(vocab.SKOS_PREF_LABEL), lang_string(text, lang))

    # ---- taxonomy ----
    p279(1000, 5); p279(1000, 35120)
    p279(1001, 1000)
    p279(1002, 1001)
    p279(1100, 1101); p279(1100, 5)
    p279(1101, 1100)
    p279(1200, 4167410); p279(1200, 17537576)
    p279(1300, 5); p279(1300, 17537576)
    p279(1400, 618123)
    p279(1500, 9999)

    sitelink("Scientist", 1000)
    sitelink("Physicist", 1001)
    sitelink("CycleA", 1100)
    sitelink("CycleB", 1101)
    sitelink("BadSub", 1200)
    sitelink("DisjointSub", 1300)
    label(1400, "Villagetype")
    label(1500, "Orphan")

    # ---- instances ----
    # humans: named individuals exercising each URI priority
    p31(42, 5);   sitelink("Douglas_Adams", 42); label(42, "Douglas Adams")
    # description / altLabel feed the labels output and class comments
    add(item(42), iri(vocab.SCHEMA_DESCRIPTION),
        lang_string("English writer and humorist", "en"))
    add(item(42), iri(vocab.SKOS + "altLabel"), lang_string("DNA", "en"))
    add(item(1000), iri(vocab.SCHEMA_DESCRIPTION),
        lang_string("person studying nature", "en"))
    # P646 freebase ids: one valid, one invalid (plan.rs:1729-1752)
    add(item(42), prop(646), string("/m/0282x"))
    add(item(64), prop(646), string("/m/badid!"))
    p31(2002, 5); label(2002, "Dürst")                      # label URI
    p31(2003, 5); label(2003, "Personne", "fr")             # fallback _Q
    p31(2004, 5); sitelink("Paris%20Hilton/Bio", 2004)      # decode+encode
    # de-wiki-only item (AllWikipedias keeps it, EnglishWikipedia drops it)
    p31(2005, 5); sitelink("Max_Muster", 2005, "https://de.wikipedia.org/wiki/")
    label(2005, "Max Muster")
    # hub skew: many instances of Q5
    for q in range(6000, 6000 + HUB_INSTANCE_COUNT):
        p31(q, HUB_CLASS)
        label(q, f"Hub {q}")
    # scientists / physicists / astros
    for q in (2010, 2011, 2012):
        p31(q, 1000); label(q, f"Sci {q}")
    for q in (2020, 2021):
        p31(q, 1001); label(q, f"Phys {q}")
    p31(2030, 1002); label(2030, "Astro 2030")
    # cycle classes' instances
    for q in (2110, 2111):
        p31(q, 1100); label(q, f"CycA {q}")
    for q in (2120, 2121):
        p31(q, 1101); label(q, f"CycB {q}")
    # bad-subtree instances
    for q in (3200, 3201, 3202, 3203, 3204):
        p31(q, 1200); label(q, f"Bad {q}")
    # disjoint-class instances
    for q in (3300, 3301):
        p31(q, 1300); label(q, f"Dis {q}")
    # places
    p31(64, 618123); sitelink("Berlin", 64); label(64, "Berlin")
    for q in (2040, 2041):
        p31(q, 1400); label(q, f"Village {q}")
    p31(2042, 618123); label(2042, "Lake Town")
    # creative works (one is also a kept class: Q1100 — classes are
    # excluded from instance sets, plan.rs:684-687)
    p31(2050, 17537576); sitelink("Work_One", 2050)
    p31(2051, 17537576); label(2051, "Work Two")
    p31(1100, 17537576)
    # orgs
    p31(2060, 43229); label(2060, "Org A")
    p31(2061, 43229); label(2061, "Org B")
    # disjoint-intersection instance: both Person and CreativeWork
    p31(3100, 5); p31(3100, 17537576); label(3100, "Androgyne Opus")
    # orphan-class instances
    for q in (3400, 3401, 3402):
        p31(q, 1500); label(q, f"Orphan {q}")

    # ---- statement chains for the facts pipeline ----
    def stmt(subject: int, pid: int, node: str, best: bool = True):
        add(item(subject), prop(pid, P), blank(node))
        if best:
            add(blank(node), RDF_TYPE, iri(vocab.WIKIBASE_BEST_RANK))

    def time_value(node: str, value_node: str, pid: int, when: str,
                   precision: int, calendar: int = vocab.Q_PROLEPTIC_GREGORIAN):
        add(blank(node), prop(pid, PSV), blank(value_node))
        add(blank(value_node), iri(vocab.WIKIBASE_TIME_VALUE), date_time(when))
        add(blank(value_node), iri(vocab.WIKIBASE_TIME_PRECISION), integer(precision))
        add(blank(value_node), iri(vocab.WIKIBASE_TIME_CALENDAR_MODEL), item(calendar))

    # Q42 birthdate, precision 11 (day), best rank, with start-date
    # qualifier for the RDF★ annotation path
    stmt(42, 569, "s42birth")
    time_value("s42birth", "v42birth", 569, "1952-03-11T00:00:00+00:00", 11)
    # deprecated (non-best-rank) second statement — must be dropped
    stmt(42, 569, "s42birth2", best=False)
    time_value("s42birth2", "v42birth2", 569, "1951-01-01T00:00:00+00:00", 11)
    # precision 9 (year) for Q2002
    stmt(2002, 569, "s2002birth")
    time_value("s2002birth", "v2002birth", 569, "1960-01-01T00:00:00+00:00", 9)
    # precision 10 (month) for Q2003
    stmt(2003, 569, "s2003birth")
    time_value("s2003birth", "v2003birth", 569, "1970-05-01T00:00:00+00:00", 10)
    # precision 14 (second) for Q2004
    stmt(2004, 569, "s2004birth")
    time_value("s2004birth", "v2004birth", 569, "1980-07-04T12:30:05+00:00", 14)
    # Julian calendar → dropped (plan.rs:1508-1510)
    stmt(2005, 569, "s2005birth")
    time_value("s2005birth", "v2005birth", 569, "1500-01-01T00:00:00+00:00", 11,
               calendar=1985786)
    # maxCount violation: Q2010 has TWO best-rank birth dates → all dropped
    stmt(2010, 569, "s2010a")
    time_value("s2010a", "v2010a", 569, "1990-01-01T00:00:00+00:00", 11)
    stmt(2010, 569, "s2010b")
    time_value("s2010b", "v2010b", 569, "1991-02-02T00:00:00+00:00", 11)
    # death date with start/end qualifiers → annotation join
    stmt(42, 570, "s42death")
    time_value("s42death", "v42death", 570, "2001-05-11T00:00:00+00:00", 11)

    # spouse (object property, range Person): Q42 → Q2002 (both Persons)
    stmt(42, 26, "s42spouse")
    add(blank("s42spouse"), prop(26, PS), item(2002))
    # start-date qualifier on the spouse statement (annotation shapes with
    # date datatypes read pqv:P580 value nodes, plan.rs:1034-1064)
    sq = "s42spouse"
    add(blank(sq), prop(580, PQV), blank("v42sp_start"))
    add(blank("v42sp_start"), iri(vocab.WIKIBASE_TIME_VALUE),
        date_time("1991-11-25T00:00:00+00:00"))
    add(blank("v42sp_start"), iri(vocab.WIKIBASE_TIME_PRECISION), integer(11))
    add(blank("v42sp_start"), iri(vocab.WIKIBASE_TIME_CALENDAR_MODEL),
        item(vocab.Q_PROLEPTIC_GREGORIAN))
    # spouse with out-of-range object (CreativeWork, not Person) → dropped
    stmt(2002, 26, "s2002spouse")
    add(blank("s2002spouse"), prop(26, PS), item(2050))
    # birthPlace (range Place): Q42 → Q64
    stmt(42, 19, "s42bp")
    add(blank("s42bp"), prop(19, PS), item(64))

    # geo coordinates for Berlin (value node) + a non-Earth globe (drop)
    stmt(64, 625, "s64geo")
    add(blank("s64geo"), prop(625, PSV), blank("v64geo"))
    add(blank("v64geo"), iri(vocab.WIKIBASE_GEO_LATITUDE), double_term(52.52437))
    add(blank("v64geo"), iri(vocab.WIKIBASE_GEO_LONGITUDE), double_term(13.41053))
    add(blank("v64geo"), iri(vocab.WIKIBASE_GEO_PRECISION), double_term(0.01))
    add(blank("v64geo"), iri(vocab.WIKIBASE_GEO_GLOBE), item(vocab.Q_EARTH))
    stmt(2042, 625, "s2042geo")
    add(blank("s2042geo"), prop(625, PSV), blank("v2042geo"))
    add(blank("v2042geo"), iri(vocab.WIKIBASE_GEO_LATITUDE), double_term(10.0))
    add(blank("v2042geo"), iri(vocab.WIKIBASE_GEO_LONGITUDE), double_term(20.0))
    add(blank("v2042geo"), iri(vocab.WIKIBASE_GEO_PRECISION), double_term(0.1))
    add(blank("v2042geo"), iri(vocab.WIKIBASE_GEO_GLOBE), item(111))  # Mars

    # duration quantity (P2047, unit second) on a creative work
    def quantity(node: str, value_node: str, pid: int, amount: str, unit: int,
                 lower: str | None = None, upper: str | None = None):
        # quantity value nodes are wdv: IRIs in the real dump, and the
        # QuantitativeValue conversion requires an IRI (plan.rs:1651-1654)
        vn = iri(WDV + value_node)
        add(blank(node), prop(pid, PSV), vn)
        add(vn, iri(vocab.WIKIBASE_QUANTITY_AMOUNT), decimal(amount))
        add(vn, iri(vocab.WIKIBASE_QUANTITY_UNIT), item(unit))
        if lower is not None:
            add(vn, iri(vocab.WIKIBASE_QUANTITY_LOWER_BOUND), decimal(lower))
        if upper is not None:
            add(vn, iri(vocab.WIKIBASE_QUANTITY_UPPER_BOUND), decimal(upper))

    stmt(2050, 2047, "s2050dur")
    quantity("s2050dur", "v2050dur", 2047, "+42", vocab.Q_SECOND)
    stmt(2051, 2047, "s2051dur")
    quantity("s2051dur", "v2051dur", 2047, "-3", vocab.Q_DAY)
    # integer quantity (P1104 number of pages, unit 1)
    stmt(2050, 1104, "s2050pages")
    quantity("s2050pages", "v2050pages", 1104, "+250", vocab.Q_UNIT_ONE)
    # integer quantity with wrong unit → dropped
    stmt(2051, 1104, "s2051pages")
    quantity("s2051pages", "v2051pages", 1104, "+100", vocab.Q_SECOND)
    # full QuantitativeValue (P2067 mass)
    stmt(42, 2067, "s42mass")
    quantity("s42mass", "v42mass", 2067, "+70.5", 11570, "+70", "+71")

    # commons image (P18): valid + invalid prefix
    stmt(42, 18, "s42img")
    add(blank("s42img"), prop(18, PS),
        iri(vocab.COMMONS_FILEPATH_PREFIX + "Douglas%20adams%20portrait.jpg"))
    stmt(2002, 18, "s2002img")
    add(blank("s2002img"), prop(18, PS), iri("http://example.com/notcommons.jpg"))

    # official website (P856): valid URL + unparsable
    stmt(2060, 856, "s2060url")
    add(blank("s2060url"), prop(856, PS), iri("https://example.org/org-a"))
    stmt(2061, 856, "s2061url")
    add(blank("s2061url"), prop(856, PS), iri("http://[bad"))

    # ISSN with sh:pattern (P236): matching + non-matching
    stmt(2050, 236, "s2050issn")
    add(blank("s2050issn"), prop(236, PS), string("2049-3630"))
    stmt(2051, 236, "s2051issn")
    add(blank("s2051issn"), prop(236, PS), string("not-an-issn"))

    # family name (plain string, P734)
    stmt(42, 734, "s42fam")
    add(blank("s42fam"), prop(734, PS), string("Adams"))

    # rdf:type wikibase:Item for every item mentioned anywhere (must run
    # LAST so quantity-unit items etc. enter the item universe and get
    # fallback URIs)
    qids = sorted(
        {s["num"] for s, _, _ in t if s["kind"] == "item"}
        | {o["num"] for _, _, o in t if o["kind"] == "item"}
    )
    for q in qids:
        add(item(q), RDF_TYPE, iri(vocab.WIKIBASE_ITEM))

    return t


def double_term(value: float) -> dict:
    return terms.double(value)


def mini_wikidata_df(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("subject", terms.TERM_SCHEMA),
            StructField("predicate", terms.TERM_SCHEMA),
            StructField("object", terms.TERM_SCHEMA),
        ]
    )
    df = spark.createDataFrame(mini_wikidata_triples(), schema)
    return df.withColumn(
        "predicate_key", terms.predicate_key_col(F.col("predicate"))
    )


def write_mini_wikidata(spark: SparkSession, path: str) -> None:
    from .sources.statements import StatementsTable

    StatementsTable.write(mini_wikidata_df(spark), path)
