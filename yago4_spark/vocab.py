"""RDF vocabulary constants used by the pipeline.

Mirrors the constant surface of the reference's ``src/vocab.rs`` (298 lines
of IRI constants) and ``src/model.rs:209-224`` (the 14 Wikidata property
namespaces). Values are public RDF/Wikidata/schema.org IRIs.
"""

from __future__ import annotations

# --- namespaces ---------------------------------------------------------
WD = "http://www.wikidata.org/entity/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = "http://schema.org/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
SH = "http://www.w3.org/ns/shacl#"
WIKIBASE = "http://wikiba.se/ontology#"
GEO_PREFIX = "geo:"
YAGO_RESOURCE_PREFIX = "http://yago-knowledge.org/resource/"
YAGO_VALUE_PREFIX = "http://yago-knowledge.org/value/"  # plan.rs:56
YS = "http://yago-knowledge.org/schema#"

# The 14 Wikidata property namespaces, in the reference's prefix-index
# order (src/model.rs:209-224). Index into this list is the ``text`` field
# of a kind='prop' term struct.
PROPERTY_PREFIXES: list[str] = [
    "http://www.wikidata.org/entity/P",
    "http://www.wikidata.org/prop/direct-normalized/P",
    "http://www.wikidata.org/prop/direct/P",
    "http://www.wikidata.org/prop/statement/value-normalized/P",
    "http://www.wikidata.org/prop/statement/value/P",
    "http://www.wikidata.org/prop/statement/P",
    "http://www.wikidata.org/prop/qualifier/value-normalized/P",
    "http://www.wikidata.org/prop/qualifier/value/P",
    "http://www.wikidata.org/prop/qualifier/P",
    "http://www.wikidata.org/prop/reference/value-normalized/P",
    "http://www.wikidata.org/prop/reference/value/P",
    "http://www.wikidata.org/prop/reference/P",
    "http://www.wikidata.org/prop/novalue/P",
    "http://www.wikidata.org/prop/P",
]

# Short aliases for the namespaces we scan most (used as predicate_key
# partition prefixes).
PFX_SHORT = {
    "http://www.wikidata.org/prop/direct/P": "wdt:P",
    "http://www.wikidata.org/prop/P": "p:P",
    "http://www.wikidata.org/prop/statement/P": "ps:P",
    "http://www.wikidata.org/prop/statement/value/P": "psv:P",
    "http://www.wikidata.org/prop/qualifier/P": "pq:P",
    "http://www.wikidata.org/prop/qualifier/value/P": "pqv:P",
    "http://www.wikidata.org/entity/P": "wd:P",
}

# --- single terms -------------------------------------------------------
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_LANG_STRING = RDF + "langString"
RDFS_LABEL = RDFS + "label"
RDFS_COMMENT = RDFS + "comment"
RDFS_SUBCLASS_OF = RDFS + "subClassOf"
RDFS_SUB_PROPERTY_OF = RDFS + "subPropertyOf"
RDFS_CLASS = RDFS + "Class"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
RDFS_DATATYPE = RDFS + "Datatype"
RDF_PROPERTY = RDF + "Property"
RDF_PLAIN_LITERAL = RDF + "PlainLiteral"
OWL_SAME_AS = OWL + "sameAs"
OWL_CLASS = OWL + "Class"
OWL_DISJOINT_WITH = OWL + "disjointWith"
OWL_INVERSE_OF = OWL + "inverseOf"
OWL_DATATYPE_PROPERTY = OWL + "DatatypeProperty"
OWL_OBJECT_PROPERTY = OWL + "ObjectProperty"
OWL_FUNCTIONAL_PROPERTY = OWL + "FunctionalProperty"
OWL_UNION_OF = OWL + "unionOf"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_DATE_TIME = XSD + "dateTime"
XSD_DATE = XSD + "date"
XSD_G_YEAR_MONTH = XSD + "gYearMonth"
XSD_G_YEAR = XSD + "gYear"
XSD_ANY_URI = XSD + "anyURI"
XSD_DURATION = XSD + "duration"
XSD_BOOLEAN = XSD + "boolean"

SCHEMA_ABOUT = SCHEMA + "about"
SCHEMA_NAME = SCHEMA + "name"
SCHEMA_THING = SCHEMA + "Thing"
SCHEMA_PERSON = SCHEMA + "Person"
SCHEMA_ALTERNATE_NAME = SCHEMA + "alternateName"
SCHEMA_DESCRIPTION = SCHEMA + "description"
SCHEMA_GEO_COORDINATES = SCHEMA + "GeoCoordinates"
SCHEMA_LATITUDE = SCHEMA + "latitude"
SCHEMA_LONGITUDE = SCHEMA + "longitude"
SCHEMA_QUANTITATIVE_VALUE = SCHEMA + "QuantitativeValue"
SCHEMA_VALUE = SCHEMA + "value"
SCHEMA_MIN_VALUE = SCHEMA + "minValue"
SCHEMA_MAX_VALUE = SCHEMA + "maxValue"
SCHEMA_UNIT_CODE = SCHEMA + "unitCode"
SCHEMA_INVERSE_OF = SCHEMA + "inverseOf"

# schema.org classes with hard-coded remap rules in the reference's
# schema output + taxonomy (plan.rs:1812-1831, 2224-2248).
SCHEMA_INTANGIBLE = SCHEMA + "Intangible"
SCHEMA_ENUMERATION = SCHEMA + "Enumeration"
SCHEMA_MEDICAL_INTANGIBLE = SCHEMA + "MedicalIntangible"
SCHEMA_MEDICAL_ENUMERATION = SCHEMA + "MedicalEnumeration"
SCHEMA_MEDICAL_ENTITY = SCHEMA + "MedicalEntity"
SCHEMA_STRUCTURED_VALUE = SCHEMA + "StructuredValue"
SCHEMA_SERIES = SCHEMA + "Series"

SKOS_PREF_LABEL = SKOS + "prefLabel"
SKOS_ALT_LABEL = SKOS + "altLabel"

WIKIBASE_ITEM = WIKIBASE + "Item"
WIKIBASE_BEST_RANK = WIKIBASE + "BestRank"
WIKIBASE_TIME_VALUE = WIKIBASE + "timeValue"
WIKIBASE_TIME_PRECISION = WIKIBASE + "timePrecision"
WIKIBASE_TIME_CALENDAR_MODEL = WIKIBASE + "timeCalendarModel"
WIKIBASE_GEO_LATITUDE = WIKIBASE + "geoLatitude"
WIKIBASE_GEO_LONGITUDE = WIKIBASE + "geoLongitude"
WIKIBASE_GEO_PRECISION = WIKIBASE + "geoPrecision"
WIKIBASE_GEO_GLOBE = WIKIBASE + "geoGlobe"
WIKIBASE_QUANTITY_AMOUNT = WIKIBASE + "quantityAmount"
WIKIBASE_QUANTITY_UNIT = WIKIBASE + "quantityUnit"
WIKIBASE_QUANTITY_LOWER_BOUND = WIKIBASE + "quantityLowerBound"
WIKIBASE_QUANTITY_UPPER_BOUND = WIKIBASE + "quantityUpperBound"

# Wikidata item QIDs with hard-coded pipeline meaning (plan.rs:44-61,
# 1498-1524, 1578-1630).
Q_EARTH = 2
Q_PROLEPTIC_GREGORIAN = 1985727
Q_PROLEPTIC_JULIAN = 1985786
Q_UNIT_ONE = 199
Q_SECOND = 11574
Q_MINUTE = 7727
Q_HOUR = 25235
Q_DAY = 573
Q_MALE = 6581097
Q_FEMALE = 6581072

# The 6 Wikimedia-internal classes excluded with their subtrees
# (plan.rs:44-51).
WD_BAD_CLASSES = [17379835, 17442446, 4167410, 13406463, 17524420, 18340514]

# Items force-included regardless of sitelink filters (plan.rs:53-58).
MANDATORY_WD_ITEMS = [Q_MALE, Q_FEMALE]

# Classes need >= this many direct instances to survive taxonomy pruning
# (plan.rs:61). Tests override to 2.
MIN_NUMBER_OF_INSTANCES = 10

ENWIKI_ARTICLE_PREFIX = "https://en.wikipedia.org/wiki/"
COMMONS_FILEPATH_PREFIX = "http://commons.wikimedia.org/wiki/Special:FilePath/"
DBPEDIA_RESOURCE_PREFIX = "http://dbpedia.org/resource/"
FREEBASE_NS_PREFIX = "http://rdf.freebase.com/ns/"
