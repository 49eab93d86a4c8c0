"""Scale-representative differential fixture: a seeded synthetic
Wikidata slice (default 100k entities, ~800 classes, ~550k statements)
plus a pure-Python oracle that independently reimplements the pipeline's
rules (taxonomy 7-step, URI priority, shape instances, ALL 9 facts
dispatch branches — dates, object-range, anyURI, geo+sides, integer,
duration, quantity+sides, commons image, sh:pattern string — plus RDF★
annotations, sh:maxCount, and the classes / simple+full types / labels /
same_as output families) from the generator's ground truth.

The mini fixture (fixtures.py) proves each rule on hand-golden rows;
this one stresses the same rules at volume — closure depth, instance
thresholds, disjoint pruning, hub skew (20% of entities are direct Q5
instances), maxCount at scale — and the test computes exact P/R of the
Spark outputs against the oracle (target 1.0).

Everything is generated with numpy from one seed; statements are built
as FLAT pandas columns and assembled into term structs JVM-side (the
same trick as the NT ingest — per-row Python dicts would dominate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import vocab
from .functions.iri import encode_iri_path_py, percent_decode_py
from .plans.shapes import Schema, sample_schema

ENWIKI = vocab.ENWIKI_ARTICLE_PREFIX
Y = vocab.YAGO_RESOURCE_PREFIX

BAD_ROOT = vocab.WD_BAD_CLASSES[0]
# synthetic qid ranges sit far above real Wikidata QIDs (~1.2e8 in the
# reference era) so the REAL config's ys:fromClass QIDs can never collide
# with generated class/entity qids (a collision makes one item both a
# mapped root and an entity, splitting its labels across both roles)
ORPHAN_ROOT = 3_999_999_999      # unmapped parent: subtree not kept
CLS_BASE = 1_000_000_000
ENT_BASE = 2_000_000_000


@dataclass
class GroundTruth:
    statements: pd.DataFrame                 # flat statement columns
    root_targets: dict[int, str]             # fromClass qid -> target IRI
    class_qid: np.ndarray
    class_parents: dict[int, list[int]]      # qid -> parent qids
    class_sitelink: dict[int, str]           # qid -> enwiki title
    class_label: dict[int, str]
    ent_qid: np.ndarray
    p31: list[tuple[int, int]]               # (entity qid, class qid)
    ent_label: dict[int, str]
    ent_sitelink: dict[int, str]
    births: dict[int, list[str]]             # ent -> best-rank date lexicals
    spouses: list[tuple[int, int]]
    # spouse chains emitted WITHOUT wikibase:BestRank typing — the
    # best-rank semi (plan.rs:1080-1083) must drop them, so they appear
    # in NO oracle set (mutation_check kills drop_best_rank_semi on them)
    deprecated_spouses: list[tuple[int, int]]
    urls: dict[int, str]
    geos: dict[int, tuple]                    # ent -> (lat, lng, prec, globe)
    pages: dict[int, tuple]                   # ent -> (amount str, unit qid)
    durations: dict[int, tuple]               # ent -> (amount str, unit qid)
    weights: dict[int, tuple]                 # ent -> (amt, lo, up, unit qid)
    images: dict[int, str]                    # ent -> commons/invalid URL
    issns: dict[int, str]                     # ent -> issn string
    spouse_quals: dict[tuple[int, int], str]  # (a,b) -> start-date lexical
    descs: dict[int, str]                     # qid -> schema:description @en
    alt_labels: dict[int, str]                # qid -> skos:altLabel @en
    labels_de: dict[int, str]                 # ent -> skos:prefLabel @de
    bad_labels: dict[int, str]                # ent -> PLAIN-STRING prefLabel
    #   (wrong datatype — must be dropped by the labels datatype filter)
    freebase: dict[int, str]                  # qid -> P646 id (some invalid)
    schema: Schema = field(default_factory=lambda: sample_schema(10))


# ~12% of enwiki titles are "hard": percent-escapes (valid UTF-8 ones
# decode then re-encode, src/plan.rs:302-309; invalid ones pass through
# verbatim in both the percent-encoding crate and urllib.unquote), raw
# unicode, and reserved chars from the encode_iri_path charset. The
# same_as family must keep them VERBATIM (prefix replace only) while
# uri_mapping decodes+re-encodes — both stressed at volume.
_HARD_TITLES = [
    "Caf%C3%A9_{}",      # valid UTF-8 escape → decodes to é, re-encodes
    "Title%20no_{}",     # %20 → space → re-encoded %20
    "Zürich_{}",    # raw latin unicode
    "東京_{}",   # CJK
    "Title_({})",        # parens
    "O'Brien_{}",        # apostrophe
    "A/B_{}",            # slash → %2F on encode
    "100%25_{}",         # escaped percent → '%' → re-encode %25
    "50%_off_{}",        # INVALID escape: both decoders pass it through
]


def _mk_title(rng, plain: str, idx) -> str:
    if rng.random() < 0.12:
        return _HARD_TITLES[int(rng.integers(0, len(_HARD_TITLES)))].format(idx)
    return plain


def generate(n_entities: int = 100_000, n_classes: int = 800,
             seed: int = 42, schema: Schema | None = None) -> GroundTruth:
    rng = np.random.default_rng(seed)
    schema = schema or sample_schema(10)
    # fromClass qid -> target class (first shape wins, like the priority-0
    # URI mapping); works for sample_schema AND the real 268-shape config
    root_targets: dict[int, str] = {}
    for ns in schema.node_shapes:
        for q in ns.from_classes:
            root_targets.setdefault(q, ns.target_class)
    root_qids = sorted(root_targets)
    assert all(q < CLS_BASE for q in root_qids), (
        "config from_class QIDs collide with synthetic qid ranges")
    S = vocab.SCHEMA
    person_q = schema.node_shape(S + "Person").from_classes[0]
    work_q = schema.node_shape(S + "CreativeWork").from_classes[0]
    thing_q = schema.node_shape(S + "Thing").from_classes[0]

    # ---- class tree --------------------------------------------------
    # qids: mapped roots + generated classes + one bad root + orphans
    cls = [*root_qids, BAD_ROOT]
    parents: dict[int, list[int]] = {q: [] for q in cls}
    parents[BAD_ROOT] = [thing_q]
    for i in range(n_classes):
        q = CLS_BASE + i
        if i < 15:                       # orphan subtree: not under a root
            parents[q] = [ORPHAN_ROOT if i < 5 else CLS_BASE + rng.integers(0, 5)]
        elif i < 30:                     # bad subtree
            parents[q] = [BAD_ROOT if i < 20 else CLS_BASE + rng.integers(15, 25)]
        elif i < 40:                     # disjoint victims: Person AND Work
            parents[q] = [person_q, work_q]
        elif i < 46:                     # dual-root: Person AND Thing —
            # Person is a direct child of Thing in the reduced yago
            # hierarchy, so these exercise the most-specific mapping
            # filter (no-sitelink ones map to BOTH targets; the Thing
            # mapping must drop) and the transitive reduction (sitelinked
            # ones get child→Person AND child→Thing edges; the →Thing
            # edge must drop). mutation_check kills
            # skip_most_specific_filter / skip_transitive_reduction here.
            parents[q] = [person_q, thing_q]
        else:                            # normal: under a root or an earlier class
            pool = root_qids + [CLS_BASE + j for j in range(46, i)]
            parents[q] = [pool[rng.integers(0, len(pool))]]
        cls.append(q)
    class_qid = np.array(cls)

    class_sitelink = {}
    class_label = {}
    for q in cls:
        if rng.random() < 0.7:
            class_sitelink[q] = _mk_title(rng, f"Class_{q}", q)
        if rng.random() < 0.9:
            class_label[q] = f"ClassLabel{q}"
    # dual-root band: half kept-for-yago (sitelink → reduction case),
    # half mapping-only (no sitelink → most-specific case)
    dual_root_qids = [CLS_BASE + i for i in range(40, min(46, n_classes))]
    for k, q in enumerate(dual_root_qids):
        if k % 2 == 0:
            class_sitelink[q] = f"DualRoot_{q}"
        else:
            class_sitelink.pop(q, None)
        class_label[q] = f"ClassLabel{q}"

    # ---- entities ----------------------------------------------------
    ent_qid = ENT_BASE + np.arange(n_entities)
    # class assignment: 20% direct Q5 (hub skew), rest zipf over classes —
    # zipf ranks PERMUTED so the heavy mass doesn't all land on the
    # planted orphan/bad/disjoint classes (generated first)
    gen_classes = class_qid[len(root_qids) + 1:]   # skip roots + bad root
    ranks = np.arange(1, len(gen_classes) + 1)
    weights = rng.permutation(1.0 / ranks)
    weights /= weights.sum()
    choice = rng.choice(len(gen_classes), size=n_entities, p=weights)
    is_hub = rng.random(n_entities) < 0.2
    p31: list[tuple[int, int]] = []
    for e, c, hub in zip(ent_qid, gen_classes[choice], is_hub):
        p31.append((int(e), person_q if hub else int(c)))
    # 5% second membership; 100 planted disjoint-intersection entities
    second = rng.choice(n_entities, size=n_entities // 20, replace=False)
    for idx in second:
        p31.append((int(ent_qid[idx]), int(gen_classes[rng.integers(0, len(gen_classes))])))
    for idx in range(100):
        # planted disjoint-intersection entities: direct Person AND Work
        e = int(ent_qid[idx])
        p31.append((e, person_q))
        p31.append((e, work_q))
    # dual-root classes get enough direct instances to clear the
    # min_instances threshold (they must be KEPT for their mapping /
    # hierarchy edges to exist at all)
    for k, q in enumerate(dual_root_qids):
        for j in range(12):
            p31.append((int(ent_qid[(300 + k * 12 + j) % n_entities]), q))
    p31 = sorted(set(p31))

    ent_label = {}
    ent_sitelink = {}
    for e in ent_qid:
        e = int(e)
        r = rng.random()
        if r < 0.8:
            ent_label[e] = f"Ent{e}"
        if r < 0.3:
            ent_sitelink[e] = _mk_title(rng, f"Title_{e}", e)

    # ---- facts ground truth -------------------------------------------
    # birth dates for a sample of entities (the pipeline decides which
    # are Person instances); ~2% get TWO best-rank dates (maxCount drop)
    births: dict[int, list[str]] = {}
    pick = rng.choice(n_entities, size=n_entities // 3, replace=False)
    for idx in pick:
        e = int(ent_qid[idx])
        y, m, d = rng.integers(1900, 2020), rng.integers(1, 13), rng.integers(1, 29)
        births[e] = [f"{y:04d}-{m:02d}-{d:02d}T00:00:00+00:00"]
        if rng.random() < 0.02:
            births[e].append(f"{y:04d}-{m:02d}-{d:02d}T00:00:00+00:00")
    spouses = []
    for idx in rng.choice(n_entities, size=n_entities // 10, replace=False):
        a = int(ent_qid[idx])
        b = int(ent_qid[rng.integers(0, n_entities)])
        if a != b:
            spouses.append((a, b))
    spouses = sorted(set(spouses))
    urls = {}
    for idx in rng.choice(n_entities, size=n_entities // 20, replace=False):
        e = int(ent_qid[idx])
        urls[e] = (f"https://example.org/e{e}" if rng.random() < 0.9
                   else "http://[bad")

    # target the value branches at entities under the right subtree
    # (plus random negatives the domain filter must drop)
    subtree_children: dict[int, list[int]] = {}
    for c, ps_ in parents.items():
        for p_ in ps_:
            subtree_children.setdefault(p_, []).append(c)

    def _desc(root: int) -> set[int]:
        seen = {root}
        todo = [root]
        while todo:
            x = todo.pop()
            for c in subtree_children.get(x, []):
                if c not in seen:
                    seen.add(c)
                    todo.append(c)
        return seen

    place_q = schema.node_shape(S + "Place").from_classes[0]
    ents_under = {
        root: [e for e, c in p31 if c in _desc(root)]
        for root in (place_q, work_q, person_q)
    }

    def branch_sample(root: int, k: int) -> list[int]:
        pool = ents_under[root]
        take = [int(x) for x in
                rng.choice(pool, size=min(k, len(pool)), replace=False)]
        extra = [int(ent_qid[i]) for i in
                 rng.choice(n_entities, size=max(k // 4, 2), replace=False)]
        return sorted(set(take + extra))

    # geo coordinates (psv value nodes; ~10% on a non-Earth globe → drop)
    geos = {}
    for e in branch_sample(place_q, n_entities // 40):
        geos[e] = (round(float(rng.uniform(-85, 85)), 4),
                   round(float(rng.uniform(-179, 179)), 4),
                   0.01,
                   vocab.Q_EARTH if rng.random() < 0.9 else 111)
    # integer quantities (wrong unit → drop), durations, full quantities
    pages = {}
    for e in branch_sample(work_q, n_entities // 40):
        pages[e] = (f"+{int(rng.integers(50, 900))}",
                    vocab.Q_UNIT_ONE if rng.random() < 0.9 else vocab.Q_SECOND)
    durations = {}
    for e in branch_sample(work_q, n_entities // 40):
        durations[e] = (f"+{int(rng.integers(10, 9000))}",
                        vocab.Q_SECOND if rng.random() < 0.7 else vocab.Q_DAY)
    weights = {}
    for e in branch_sample(person_q, n_entities // 40):
        amt = int(rng.integers(40, 200))
        unit = int(ent_qid[rng.integers(0, n_entities)])  # any mapped item
        if rng.random() < 0.8:
            weights[e] = (f"+{amt}.5", f"+{amt}", f"+{amt + 1}", unit)
        else:
            weights[e] = (f"+{amt}.5", None, None, unit)  # no bounds → drop
    # commons images on Thing instances (~10% non-commons URL → drop)
    thing_q2 = schema.node_shape(S + "Thing").from_classes[0]
    ents_under[thing_q2] = [e for e, c in p31 if c in _desc(thing_q2)]
    images = {}
    for e in branch_sample(thing_q2, n_entities // 40):
        images[e] = (vocab.COMMONS_FILEPATH_PREFIX + f"Img_{e}.jpg"
                     if rng.random() < 0.9
                     else f"http://example.com/notcommons{e}.jpg")
    # ISSN strings with sh:pattern (~20% malformed → drop)
    issns = {}
    for e in branch_sample(work_q, n_entities // 40):
        if rng.random() < 0.8:
            issns[e] = (f"{rng.integers(1000, 9999)}-"
                        f"{rng.integers(100, 999)}"
                        f"{rng.choice(list('0123456789X'))}")
        else:
            issns[e] = f"bad-issn-{e}"

    # descriptions / alt labels (labels + classes-description outputs)
    # and Freebase ids (same_as output; ~20% fail the /m/ regex)
    descs: dict[int, str] = {}
    alt_labels: dict[int, str] = {}
    freebase: dict[int, str] = {}
    for q in cls:
        if rng.random() < 0.5:
            descs[int(q)] = f"Class description {q}"
    for e in ent_qid:
        e = int(e)
        r = rng.random()
        if r < 0.4:
            descs[e] = f"Entity description {e}"
        if r < 0.2:
            alt_labels[e] = f"AltEnt{e}"
        if r < 0.15:
            freebase[e] = (f"/m/0{np.base_repr(e, 36).lower()}"
                           if rng.random() < 0.8 else f"/m/9bad{e}")

    # non-en prefLabels (~10%): flow through the labels output with
    # their language tag intact (mutation_check kills
    # langstring_lang_constant on them); english_labels must ignore
    # them for URI naming. And plain-STRING prefLabels (~5%): wrong
    # datatype — the labels datatype filter must drop them
    # (mutation_check kills labels_datatype_filter_dropped).
    labels_de: dict[int, str] = {}
    bad_labels: dict[int, str] = {}
    for e in ent_qid:
        e = int(e)
        r = rng.random()
        if r < 0.1:
            labels_de[e] = f"DeEnt{e}"
        elif r < 0.15:
            bad_labels[e] = f"PlainStringLabel{e}"

    # start-date qualifiers on ~30% of spouse statements (RDF★ path)
    spouse_quals = {}
    for a, b in spouses:
        if rng.random() < 0.3:
            y = rng.integers(1950, 2020)
            spouse_quals[(a, b)] = f"{y:04d}-06-15T00:00:00+00:00"

    # deprecated/normal-rank spouse statements (~2% of entities): real
    # statement chains that lack BestRank typing and must never surface
    spouse_set = set(spouses)
    deprecated_spouses = []
    for idx in rng.choice(n_entities, size=max(1, n_entities // 50),
                          replace=False):
        a = int(ent_qid[idx])
        b = int(ent_qid[rng.integers(0, n_entities)])
        if a != b and (a, b) not in spouse_set:
            deprecated_spouses.append((a, b))
    deprecated_spouses = sorted(set(deprecated_spouses))

    # ---- statements (flat columns) -------------------------------------
    frames: list[pd.DataFrame] = []

    def flat(pk, s_kind, s_text, s_num, o_kind, o_text, o_num,
             o_lang=None, o_dbl=None):
        frames.append(pd.DataFrame({
            "pk": pk, "s_kind": s_kind, "s_text": s_text, "s_num": s_num,
            "o_kind": o_kind, "o_text": o_text, "o_num": o_num,
            "o_lang": o_lang, "o_dbl": o_dbl,
        }))

    all_items = sorted(
        {int(q) for q in class_qid} | {int(q) for q in ent_qid}
        | {ORPHAN_ROOT}
    )
    items = pd.Series(all_items, dtype="int64")
    flat("rdf:type", "item", None, items, "iri", vocab.WIKIBASE_ITEM, None)

    # P279 edges
    ch, pa_ = zip(*[(c, p_) for c, ps_ in parents.items() for p_ in ps_])
    flat("wdt:P279", "item", None, pd.Series(ch, dtype="int64"),
         "item", None, pd.Series(pa_, dtype="int64"))

    # P31
    e31, c31 = zip(*p31)
    flat("wdt:P31", "item", None, pd.Series(e31, dtype="int64"),
         "item", None, pd.Series(c31, dtype="int64"))

    # labels (en) for classes + entities
    lq = [*class_label.keys(), *ent_label.keys()]
    lt = [*class_label.values(), *ent_label.values()]
    frames.append(pd.DataFrame({
        "pk": "skos:prefLabel", "s_kind": "item", "s_text": None,
        "s_num": pd.Series(lq, dtype="int64"),
        "o_kind": "langString", "o_text": lt, "o_num": None, "o_lang": "en",
    }))

    # non-en labels (langString @de) + wrong-datatype plain-string labels
    frames.append(pd.DataFrame({
        "pk": "skos:prefLabel", "s_kind": "item", "s_text": None,
        "s_num": pd.Series(list(labels_de.keys()), dtype="int64"),
        "o_kind": "langString", "o_text": list(labels_de.values()),
        "o_num": None, "o_lang": "de",
    }))
    frames.append(pd.DataFrame({
        "pk": "skos:prefLabel", "s_kind": "item", "s_text": None,
        "s_num": pd.Series(list(bad_labels.keys()), dtype="int64"),
        "o_kind": "string", "o_text": list(bad_labels.values()),
        "o_num": None, "o_lang": None,
    }))

    # descriptions + alt labels (@en), Freebase ids
    frames.append(pd.DataFrame({
        "pk": "schema:description", "s_kind": "item", "s_text": None,
        "s_num": pd.Series(list(descs.keys()), dtype="int64"),
        "o_kind": "langString", "o_text": list(descs.values()),
        "o_num": None, "o_lang": "en",
    }))
    frames.append(pd.DataFrame({
        "pk": "skos:altLabel", "s_kind": "item", "s_text": None,
        "s_num": pd.Series(list(alt_labels.keys()), dtype="int64"),
        "o_kind": "langString", "o_text": list(alt_labels.values()),
        "o_num": None, "o_lang": "en",
    }))
    flat("wdt:P646", "item", None,
         pd.Series(list(freebase.keys()), dtype="int64"),
         "string", list(freebase.values()), None)

    # sitelinks
    sq = [*class_sitelink.keys(), *ent_sitelink.keys()]
    st_ = [*class_sitelink.values(), *ent_sitelink.values()]
    frames.append(pd.DataFrame({
        "pk": "schema:about", "s_kind": "iri",
        "s_text": [ENWIKI + t for t in st_], "s_num": None,
        "o_kind": "item", "o_text": None,
        "o_num": pd.Series(sq, dtype="int64"), "o_lang": None,
    }))

    # birth statement chains (p:P569 → stmt; stmt BestRank;
    # psv:P569 → value node; timeValue/Precision/Calendar)
    stmt_subj, stmt_node, val_node, val_time = [], [], [], []
    for e, dates in births.items():
        for j, when in enumerate(dates):
            s_id = f"sb{e}_{j}"
            v_id = f"vb{e}_{j}"
            stmt_subj.append(e)
            stmt_node.append(s_id)
            val_node.append(v_id)
            val_time.append(when)
    flat("p:P569", "item", None, pd.Series(stmt_subj, dtype="int64"),
         "blank", stmt_node, None)
    flat("rdf:type", "blank", stmt_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("psv:P569", "blank", stmt_node, None, "blank", val_node, None)
    flat("wikibase:timeValue", "blank", val_node, None,
         "dateTime", val_time, None)
    flat("wikibase:timePrecision", "blank", val_node, None,
         "integer", None, pd.Series([11] * len(val_node), dtype="int64"))
    flat("wikibase:timeCalendarModel", "blank", val_node, None,
         "item", None,
         pd.Series([vocab.Q_PROLEPTIC_GREGORIAN] * len(val_node), dtype="int64"))

    # spouse chains: p:P26 + BestRank + ps:P26 → item
    sp_subj = [a for a, _ in spouses]
    sp_node = [f"ss{a}_{b}" for a, b in spouses]
    sp_obj = [b for _, b in spouses]
    flat("p:P26", "item", None, pd.Series(sp_subj, dtype="int64"),
         "blank", sp_node, None)
    flat("rdf:type", "blank", sp_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("ps:P26", "blank", sp_node, None,
         "item", None, pd.Series(sp_obj, dtype="int64"))

    # deprecated-rank spouse chains: p:P26 + ps:P26, NO BestRank typing
    if deprecated_spouses:
        dp_node = [f"sd{a}_{b}" for a, b in deprecated_spouses]
        flat("p:P26", "item", None,
             pd.Series([a for a, _ in deprecated_spouses], dtype="int64"),
             "blank", dp_node, None)
        flat("ps:P26", "blank", dp_node, None, "item", None,
             pd.Series([b for _, b in deprecated_spouses], dtype="int64"))

    # url chains: p:P856 + BestRank + ps:P856 → iri
    u_subj = list(urls.keys())
    u_node = [f"su{e}" for e in u_subj]
    u_val = list(urls.values())
    flat("p:P856", "item", None, pd.Series(u_subj, dtype="int64"),
         "blank", u_node, None)
    flat("rdf:type", "blank", u_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("ps:P856", "blank", u_node, None, "iri", u_val, None)

    # geo chains: p:P625 + BestRank + psv:P625 → blank value node with
    # lat/lng/prec doubles and a globe item
    g_subj = list(geos.keys())
    g_node = [f"sg{e}" for e in g_subj]
    g_val = [f"vg{e}" for e in g_subj]
    flat("p:P625", "item", None, pd.Series(g_subj, dtype="int64"),
         "blank", g_node, None)
    flat("rdf:type", "blank", g_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("psv:P625", "blank", g_node, None, "blank", g_val, None)
    flat("wikibase:geoLatitude", "blank", g_val, None, "double", None, None,
         o_dbl=[geos[e][0] for e in g_subj])
    flat("wikibase:geoLongitude", "blank", g_val, None, "double", None, None,
         o_dbl=[geos[e][1] for e in g_subj])
    flat("wikibase:geoPrecision", "blank", g_val, None, "double", None, None,
         o_dbl=[geos[e][2] for e in g_subj])
    flat("wikibase:geoGlobe", "blank", g_val, None, "item", None,
         pd.Series([geos[e][3] for e in g_subj], dtype="int64"))

    # quantity chains (integer pages, durations, full quantities): value
    # nodes are wdv: IRIs with amount/unit (+bounds for full quantities)
    def quantity_chain(pk_p, pk_psv, subj, tag, amounts, units,
                       lowers=None, uppers=None):
        node = [f"s{tag}{e}" for e in subj]
        val = [f"http://www.wikidata.org/value/V{tag}{e}" for e in subj]
        flat(pk_p, "item", None, pd.Series(subj, dtype="int64"),
             "blank", node, None)
        flat("rdf:type", "blank", node, None,
             "iri", vocab.WIKIBASE_BEST_RANK, None)
        flat(pk_psv, "blank", node, None, "iri", val, None)
        flat("wikibase:quantityAmount", "iri", val, None,
             "decimal", amounts, None)
        flat("wikibase:quantityUnit", "iri", val, None, "item", None,
             pd.Series(units, dtype="int64"))
        if lowers is not None:
            mask = [lo is not None for lo in lowers]
            v2 = [v for v, m in zip(val, mask) if m]
            flat("wikibase:quantityLowerBound", "iri", v2, None, "decimal",
                 [lo for lo in lowers if lo is not None], None)
            flat("wikibase:quantityUpperBound", "iri", v2, None, "decimal",
                 [u for u, m in zip(uppers, mask) if m], None)

    pg = list(pages.keys())
    quantity_chain("p:P1104", "psv:P1104", pg, "p",
                   [pages[e][0] for e in pg], [pages[e][1] for e in pg])
    du = list(durations.keys())
    quantity_chain("p:P2047", "psv:P2047", du, "d",
                   [durations[e][0] for e in du],
                   [durations[e][1] for e in du])
    wt = list(weights.keys())
    quantity_chain("p:P2067", "psv:P2067", wt, "w",
                   [weights[e][0] for e in wt],
                   [weights[e][3] for e in wt],
                   lowers=[weights[e][1] for e in wt],
                   uppers=[weights[e][2] for e in wt])

    # image chains: p:P18 + BestRank + ps:P18 → iri
    im = list(images.keys())
    im_node = [f"si{e}" for e in im]
    flat("p:P18", "item", None, pd.Series(im, dtype="int64"),
         "blank", im_node, None)
    flat("rdf:type", "blank", im_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("ps:P18", "blank", im_node, None, "iri",
         [images[e] for e in im], None)

    # ISSN chains: p:P236 + BestRank + ps:P236 → string
    isn = list(issns.keys())
    isn_node = [f"sn{e}" for e in isn]
    flat("p:P236", "item", None, pd.Series(isn, dtype="int64"),
         "blank", isn_node, None)
    flat("rdf:type", "blank", isn_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("ps:P236", "blank", isn_node, None, "string",
         [issns[e] for e in isn], None)

    # spouse start-date qualifiers (pqv:P580 → time value nodes)
    if spouse_quals:
        qs = list(spouse_quals.keys())
        q_node = [f"ss{a}_{b}" for a, b in qs]
        q_val = [f"vq{a}_{b}" for a, b in qs]
        flat("pqv:P580", "blank", q_node, None, "blank", q_val, None)
        flat("wikibase:timeValue", "blank", q_val, None, "dateTime",
             [spouse_quals[k] for k in qs], None)
        flat("wikibase:timePrecision", "blank", q_val, None, "integer", None,
             pd.Series([11] * len(qs), dtype="int64"))
        flat("wikibase:timeCalendarModel", "blank", q_val, None, "item", None,
             pd.Series([vocab.Q_PROLEPTIC_GREGORIAN] * len(qs), dtype="int64"))

    statements = pd.concat(frames, ignore_index=True)
    for col in ("o_lang", "o_dbl"):
        if col not in statements:
            statements[col] = None

    return GroundTruth(
        statements=statements, root_targets=root_targets,
        class_qid=class_qid, class_parents=parents,
        class_sitelink=class_sitelink, class_label=class_label,
        ent_qid=ent_qid, p31=p31, ent_label=ent_label,
        ent_sitelink=ent_sitelink, births=births, spouses=spouses,
        deprecated_spouses=deprecated_spouses,
        urls=urls, geos=geos, pages=pages, durations=durations,
        weights=weights, images=images, issns=issns,
        spouse_quals=spouse_quals, descs=descs, alt_labels=alt_labels,
        labels_de=labels_de, bad_labels=bad_labels,
        freebase=freebase, schema=schema,
    )


def statements_df(spark: SparkSession, gt: GroundTruth) -> DataFrame:
    """Assemble the flat pandas statements into term-struct rows."""
    df = spark.createDataFrame(gt.statements)

    prop_prefix = {
        "wdt": "http://www.wikidata.org/prop/direct/P",
        "p": "http://www.wikidata.org/prop/P",
        "ps": "http://www.wikidata.org/prop/statement/P",
        "psv": "http://www.wikidata.org/prop/statement/value/P",
        "pq": "http://www.wikidata.org/prop/qualifier/P",
        "pqv": "http://www.wikidata.org/prop/qualifier/value/P",
    }
    pk = F.col("pk")
    short = F.split(pk, ":").getItem(0)
    pid = F.regexp_extract(F.split(pk, ":").getItem(1), "^P([0-9]+)$", 1)
    pred_prefix = F.lit(None).cast("string")
    for s, full in prop_prefix.items():
        pred_prefix = F.when(short == s, F.lit(full)).otherwise(pred_prefix)
    iri_key = {
        "rdf:type": vocab.RDF_TYPE,
        "skos:prefLabel": vocab.SKOS_PREF_LABEL,
        "skos:altLabel": vocab.SKOS_ALT_LABEL,
        "schema:description": vocab.SCHEMA_DESCRIPTION,
        "schema:about": vocab.SCHEMA_ABOUT,
        "wikibase:timeValue": vocab.WIKIBASE_TIME_VALUE,
        "wikibase:timePrecision": vocab.WIKIBASE_TIME_PRECISION,
        "wikibase:timeCalendarModel": vocab.WIKIBASE_TIME_CALENDAR_MODEL,
        "wikibase:geoLatitude": vocab.WIKIBASE_GEO_LATITUDE,
        "wikibase:geoLongitude": vocab.WIKIBASE_GEO_LONGITUDE,
        "wikibase:geoPrecision": vocab.WIKIBASE_GEO_PRECISION,
        "wikibase:geoGlobe": vocab.WIKIBASE_GEO_GLOBE,
        "wikibase:quantityAmount": vocab.WIKIBASE_QUANTITY_AMOUNT,
        "wikibase:quantityUnit": vocab.WIKIBASE_QUANTITY_UNIT,
        "wikibase:quantityLowerBound": vocab.WIKIBASE_QUANTITY_LOWER_BOUND,
        "wikibase:quantityUpperBound": vocab.WIKIBASE_QUANTITY_UPPER_BOUND,
    }
    pred_iri = F.lit(None).cast("string")
    for k, full in iri_key.items():
        pred_iri = F.when(pk == k, F.lit(full)).otherwise(pred_iri)

    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    def term(kind, text, num, lang=None, dbl=None):
        return F.struct(
            kind.alias("kind"), text.alias("text"), num.alias("num"),
            (dbl if dbl is not None
             else F.lit(None).cast("double")).alias("dbl"),
            (lang if lang is not None else null_s).alias("lang"),
            null_s.alias("datatype"),
        )

    predicate = F.when(
        pred_prefix.isNotNull(),
        term(F.lit("prop"), pred_prefix, pid.try_cast("long")),
    ).otherwise(term(F.lit("iri"), pred_iri, null_l))

    out = df.select(
        term(F.col("s_kind"),
             F.when(F.col("s_kind") == "blank",
                    F.concat(F.lit("_:"), F.col("s_text")))
             .otherwise(F.col("s_text")),
             F.col("s_num").cast("long")).alias("subject"),
        predicate.alias("predicate"),
        term(F.col("o_kind"),
             F.when(F.col("o_kind") == "blank",
                    F.concat(F.lit("_:"), F.col("o_text")))
             .otherwise(F.col("o_text")),
             F.col("o_num").cast("long"),
             lang=F.col("o_lang"),
             dbl=F.col("o_dbl").cast("double")).alias("object"),
        F.col("pk").alias("predicate_key"),
    )
    return out


# ---------------------------------------------------------------------
# pure-Python oracle (mirrors plans/taxonomy.py, uri_mapping.py,
# instances.py, all 9 facts dispatch branches + RDF★, and the classes /
# types / labels / same_as output builders)
# ---------------------------------------------------------------------

@dataclass
class Oracle:
    uri: dict[int, str]
    yago_classes: set[str]
    class_mapping: set[tuple[int, str]]
    sub_class_of: set[tuple[str, str]]
    instances: dict[str, set[str]]           # shape target → entity URIs
    facts: set[tuple[str, str, str]]         # (s_uri, pred, obj repr)
    annotated: set[tuple]                    # (s, p, o, ann_p, ann_o)
    classes_out: set[tuple[str, str, str]]   # classes-description triples
    simple_types: set[tuple[str, str, str]]
    full_types: set[tuple[str, str, str]]
    labels_out: set[tuple[str, str, str]]
    same_as: set[tuple[str, str, str]]


def compute_oracle(gt: GroundTruth) -> Oracle:
    schema = gt.schema
    from_classes = set(schema.mapped_class_qids())

    # --- class graph ----------------------------------------------------
    children: dict[int, list[int]] = {}
    up: dict[int, list[int]] = {}
    for c, ps_ in gt.class_parents.items():
        if c in from_classes:
            continue  # mapped classes keep no wd parents (plan.rs:437-441)
        for p_ in ps_:
            children.setdefault(p_, []).append(c)
            up.setdefault(c, []).append(p_)

    def desc(roots) -> set[int]:
        seen = set(roots)
        todo = list(roots)
        while todo:
            n = todo.pop()
            for c in children.get(n, []):
                if c not in seen:
                    seen.add(c)
                    todo.append(c)
        return seen

    def ancestors(n) -> set[int]:
        seen = set()
        todo = [n]
        while todo:
            x = todo.pop()
            for p_ in up.get(x, []):
                if p_ not in seen:
                    seen.add(p_)
                    todo.append(p_)
        return seen

    inst_count: dict[int, int] = {}
    for _, c in gt.p31:
        inst_count[c] = inst_count.get(c, 0) + 1

    mapped_subtree = desc(from_classes)
    bad = desc(vocab.WD_BAD_CLASSES)
    disjoint_nodes: set[int] = set()
    for c1, c2 in schema.disjoint:
        q1 = set(schema.node_shape(c1).from_classes)
        q2 = set(schema.node_shape(c2).from_classes)
        if q1 and q2:
            disjoint_nodes |= desc(q1) & desc(q2)
    min_inst = {c for c, n in inst_count.items()
                if n >= schema.min_instances}
    classes_to_keep = (
        ((mapped_subtree & min_inst) - bad - disjoint_nodes) | from_classes
    )
    has_enwiki = set(gt.class_sitelink) | set(gt.ent_sitelink)
    kept_for_yago = (classes_to_keep & has_enwiki) | from_classes

    # --- URI mapping -----------------------------------------------------
    labels_en = {**gt.class_label, **gt.ent_label}
    sitelinks = {**gt.class_sitelink, **gt.ent_sitelink}
    all_items = ({int(q) for q in gt.class_qid} | {int(q) for q in gt.ent_qid}
                 | {ORPHAN_ROOT} | set(vocab.MANDATORY_WD_ITEMS))
    uri: dict[int, str] = {}
    for q in all_items:
        if q in from_classes:
            uri[q] = gt.root_targets[q]
        elif q in sitelinks:
            uri[q] = Y + encode_iri_path_py(percent_decode_py(sitelinks[q]))
        elif q in labels_en:
            uri[q] = Y + encode_iri_path_py(labels_en[q]) + f"_Q{q}"
        else:
            uri[q] = Y + f"_Q{q}"

    # --- hierarchy (child URI → mapped ancestor target) -----------------
    sub_full: set[tuple[str, str]] = set()
    for c in kept_for_yago:
        if c in from_classes:
            continue
        for anc in ancestors(c) & from_classes:
            sub_full.add((uri[c], uri[anc]))
    sub_full |= set(schema.super_classes)
    # one-step transitive reduction
    par: dict[str, set[str]] = {}
    for ch_, p_ in sub_full:
        par.setdefault(ch_, set()).add(p_)
    sub_reduced = {
        (c, p_) for (c, p_) in sub_full
        if not any(p_ in par.get(m, ()) for m in par[c] if m != p_)
    }

    # --- class mapping ----------------------------------------------------
    mapping: set[tuple[int, str]] = set()
    for c in classes_to_keep:
        if c in kept_for_yago:
            mapping.add((c, uri[c]))
        else:
            for anc in ancestors(c) & from_classes:
                mapping.add((c, uri[anc]))
    # most-specific: drop (q, cls) if q also maps to a direct child of cls
    red_par: dict[str, set[str]] = {}
    for ch_, p_ in sub_reduced:
        red_par.setdefault(ch_, set()).add(p_)
    by_q: dict[int, set[str]] = {}
    for q, c in mapping:
        by_q.setdefault(q, set()).add(c)
    mapping = {
        (q, c) for (q, c) in mapping
        if not any(c in red_par.get(other, ()) for other in by_q[q]
                   if other != c)
    }

    yago_classes = {uri[c] for c in kept_for_yago}

    # --- shape instances ---------------------------------------------------
    cmap: dict[int, set[str]] = {}
    for q, c in mapping:
        cmap.setdefault(q, set()).add(c)
    # downward closure over the REDUCED class-URI hierarchy
    down_uri: dict[str, set[str]] = {}
    for ch_, p_ in sub_reduced:
        down_uri.setdefault(p_, set()).add(ch_)

    def subtree(target: str) -> set[str]:
        seen = {target}
        todo = [target]
        while todo:
            n = todo.pop()
            for c in down_uri.get(n, ()):
                if c not in seen:
                    seen.add(c)
                    todo.append(c)
        return seen

    inst_classes: dict[int, set[str]] = {}
    for e, c in gt.p31:
        for yc in cmap.get(c, ()):
            inst_classes.setdefault(e, set()).add(yc)

    instances: dict[str, set[str]] = {}
    for ns in schema.node_shapes:
        tree = subtree(ns.target_class)
        instances[ns.target_class] = {
            uri[e] for e, ycs in inst_classes.items()
            if ycs & tree and uri[e] not in yago_classes
        }
    removed = set()
    for c1, c2 in schema.disjoint:
        removed |= instances[c1] & instances[c2]
    for k in instances:
        instances[k] -= removed

    # --- facts: every generated branch, shape-driven so the real config
    # works too (a PID may be mapped by several shapes; each shape has
    # its own parent-domain filter and dispatch branch) ----------------
    from .functions.values import round_degrees
    from .terms import format_f64

    S = vocab.SCHEMA
    facts: set[tuple[str, str, str]] = set()
    by_pid: dict[int, list] = {}
    for ps in schema.property_shapes:
        for pid in ps.from_properties:
            by_pid.setdefault(pid, []).append(ps)
    date_dts = sorted([vocab.XSD_DATE, vocab.XSD_DATE_TIME,
                       vocab.XSD_G_YEAR, vocab.XSD_G_YEAR_MONTH])

    def dom(ps):
        return instances.get(ps.parent_shape, set())

    for ps in by_pid.get(569, []):
        if sorted(ps.datatypes) != date_dts:
            continue
        for e, dates in gt.births.items():
            if uri[e] not in dom(ps):
                continue
            if ps.max_count is not None and len(dates) > ps.max_count:
                continue  # sh:maxCount group drop
            for lex in set(dates):
                facts.add((uri[e], ps.path,
                           f'"{lex[:10]}"^^<{vocab.XSD_DATE}>'))
    for ps in by_pid.get(26, []):
        expected = {schema.target_class_of(n) for n in ps.nodes}
        allowed = set().union(*(instances.get(c, set()) for c in expected))
        for a, b in gt.spouses:
            if uri[a] in dom(ps) and uri[b] in allowed:
                facts.add((uri[a], ps.path, f"<{uri[b]}>"))
    for ps in by_pid.get(856, []):
        if list(ps.datatypes) != [vocab.XSD_ANY_URI]:
            continue
        for e, u in gt.urls.items():
            if uri[e] in dom(ps) and u != "http://[bad":
                facts.add((uri[e], ps.path,
                           f'"{u}"^^<{vocab.XSD_ANY_URI}>'))
    for ps in by_pid.get(625, []):
        expected = [schema.target_class_of(n) for n in ps.nodes]
        if expected != [vocab.SCHEMA_GEO_COORDINATES]:
            continue
        for e, (lat, lng, prec, globe) in gt.geos.items():
            if uri[e] not in dom(ps) or globe != vocab.Q_EARTH:
                continue
            gi = (f"geo:{format_f64(round_degrees(lat, prec))},"
                  f"{format_f64(round_degrees(lng, prec))}")
            facts.add((uri[e], ps.path, f"<{gi}>"))
            facts.add((gi, vocab.RDF_TYPE,
                       f"<{vocab.SCHEMA_GEO_COORDINATES}>"))
            facts.add((gi, vocab.SCHEMA_LATITUDE,
                       f'"{format_f64(lat)}"^^<{vocab.XSD_DOUBLE}>'))
            facts.add((gi, vocab.SCHEMA_LONGITUDE,
                       f'"{format_f64(lng)}"^^<{vocab.XSD_DOUBLE}>'))
    for ps in by_pid.get(1104, []):
        if list(ps.datatypes) != [vocab.XSD_INTEGER]:
            continue
        for e, (amt, unit) in gt.pages.items():
            if uri[e] in dom(ps) and unit == vocab.Q_UNIT_ONE:
                facts.add((uri[e], ps.path,
                           f'"{int(amt)}"^^<{vocab.XSD_INTEGER}>'))
    for ps in by_pid.get(2047, []):
        if list(ps.datatypes) != [vocab.XSD_DURATION]:
            continue
        for e, (amt, unit) in gt.durations.items():
            if uri[e] not in dom(ps):
                continue
            n = int(amt)
            body = f"PT{n}S" if unit == vocab.Q_SECOND else f"P{n}D"
            facts.add((uri[e], ps.path,
                       f'"{body}"^^<{vocab.XSD_DURATION}>'))
    for ps in by_pid.get(2067, []):
        expected = [schema.target_class_of(n) for n in ps.nodes]
        if expected != [vocab.SCHEMA_QUANTITATIVE_VALUE]:
            continue
        for e, (amt, lo, up, unit) in gt.weights.items():
            if uri[e] not in dom(ps) or lo is None or unit not in uri:
                continue
            node = f"http://www.wikidata.org/value/Vw{e}"
            facts.add((uri[e], ps.path, f"<{node}>"))
            facts.add((node, vocab.RDF_TYPE,
                       f"<{vocab.SCHEMA_QUANTITATIVE_VALUE}>"))
            facts.add((node, vocab.SCHEMA_VALUE,
                       f'"{amt}"^^<{vocab.XSD_DECIMAL}>'))
            facts.add((node, vocab.SCHEMA_MIN_VALUE,
                       f'"{lo}"^^<{vocab.XSD_DECIMAL}>'))
            facts.add((node, vocab.SCHEMA_MAX_VALUE,
                       f'"{up}"^^<{vocab.XSD_DECIMAL}>'))
            facts.add((node, vocab.SCHEMA_UNIT_CODE, f"<{uri[unit]}>"))

    for ps in by_pid.get(18, []):
        expected = [schema.target_class_of(n) for n in ps.nodes]
        if expected != [S + "ImageObject"]:
            continue
        for e, u in gt.images.items():
            if (uri[e] in dom(ps)
                    and u.startswith(vocab.COMMONS_FILEPATH_PREFIX)):
                facts.add((uri[e], ps.path, f"<{u}>"))
    import re as _re

    for ps in by_pid.get(236, []):
        if vocab.XSD_STRING not in ps.datatypes or ps.nodes:
            continue
        for e, v in gt.issns.items():
            if uri[e] not in dom(ps):
                continue
            if ps.pattern and not _re.search(ps.pattern, v):
                continue
            facts.add((uri[e], ps.path, f'"{v}"'))

    # RDF★ annotations: start-date qualifiers on surviving spouse facts
    annotated: set[tuple] = set()
    ann_shapes = [a for a in schema.annotation_shapes
                  if 580 in a.from_properties]
    for ps in by_pid.get(26, []):
        for (a, b), when in gt.spouse_quals.items():
            fact = (uri[a], ps.path, f"<{uri[b]}>")
            if fact not in facts:
                continue
            for ann in ann_shapes:
                annotated.add((*fact, ann.path,
                               f'"{when[:10]}"^^<{vocab.XSD_DATE}>'))

    # --- the 4 remaining output families ------------------------------
    things = instances.get(vocab.SCHEMA_THING, set())

    # classes-description (build_classes_description, plan.rs:771-814):
    # owl:Class typing + reduced subclass edges + labels/comments of
    # items whose URI is a YAGO class
    classes_out: set[tuple[str, str, str]] = set()
    for cu in yago_classes:
        classes_out.add((cu, vocab.RDF_TYPE, f"<{vocab.OWL_CLASS}>"))
    for ch_, p_ in sub_reduced:
        classes_out.add((ch_, vocab.RDFS_SUBCLASS_OF, f"<{p_}>"))
    for q, lbl in labels_en.items():
        if uri[q] in yago_classes:
            classes_out.add((uri[q], vocab.RDFS_LABEL, f'"{lbl}"@en'))
    for q, d in gt.descs.items():
        if uri[q] in yago_classes:
            classes_out.add((uri[q], vocab.RDFS_COMMENT, f'"{d}"@en'))

    # simple types (build_simple_instance_of, plan.rs:734-744)
    simple_types = {
        (i, vocab.RDF_TYPE, f"<{target}>")
        for target, insts in instances.items() for i in insts
    }

    # full types (build_full_instance_of, plan.rs:747-768): P31 × class
    # mapping, Thing instances only
    full_types: set[tuple[str, str, str]] = set()
    for e, c in gt.p31:
        if uri[e] not in things:
            continue
        for yc in cmap.get(c, ()):
            full_types.add((uri[e], vocab.RDF_TYPE, f"<{yc}>"))

    # labels output (build_simple_properties, plan.rs:818-892):
    # from_predicates shapes, langString datatype, parent-shape domain
    labels_out: set[tuple[str, str, str]] = set()
    # (pred_key, source dict, language). gt.bad_labels (plain strings,
    # wrong datatype) are deliberately ABSENT — the pipeline's datatype
    # filter must drop them.
    label_sources = [
        ("skos:prefLabel", labels_en, "en"),
        ("skos:prefLabel", gt.labels_de, "de"),
        ("schema:description", gt.descs, "en"),
        ("skos:altLabel", gt.alt_labels, "en"),
    ]
    for ps in schema.property_shapes:
        if not ps.from_predicates:
            continue
        domain = instances.get(ps.parent_shape, set())
        for pred_key in ps.from_predicates:
            for src_key, src, lang in label_sources:
                if src_key != pred_key:
                    continue
                for q, v in src.items():
                    if uri[q] in domain:
                        labels_out.add((uri[q], ps.path, f'"{v}"@{lang}'))

    # same_as (build_same_as, plan.rs:1690-1780)
    import re as _re2

    same_as: set[tuple[str, str, str]] = set()
    for q, yu in uri.items():
        if yu in things:
            same_as.add((yu, vocab.OWL_SAME_AS,
                         f"<http://www.wikidata.org/entity/Q{q}>"))
    for q, title in sitelinks.items():
        if uri[q] in things:
            same_as.add((uri[q], vocab.OWL_SAME_AS,
                         f"<{vocab.DBPEDIA_RESOURCE_PREFIX}{title}>"))
            same_as.add((uri[q], vocab.SCHEMA + "sameAs",
                         f'"{ENWIKI}{title}"^^<{vocab.XSD_ANY_URI}>'))
    fb_re = _re2.compile(r"/m/0([0-9a-z_]{2,6}|1[0123][0-9a-z_]{5})$")
    for q, fb in gt.freebase.items():
        if fb_re.search(fb) and uri[q] in things:
            same_as.add((uri[q], vocab.OWL_SAME_AS,
                         f"<{vocab.FREEBASE_NS_PREFIX}"
                         f"{fb[1:].replace('/', '.')}>"))

    return Oracle(uri=uri, yago_classes=yago_classes, class_mapping=mapping,
                  sub_class_of=sub_reduced, instances=instances, facts=facts,
                  annotated=annotated, classes_out=classes_out,
                  simple_types=simple_types, full_types=full_types,
                  labels_out=labels_out, same_as=same_as)
