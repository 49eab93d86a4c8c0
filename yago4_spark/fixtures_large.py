"""Scale-representative differential fixture: a seeded synthetic
Wikidata slice (default 100k entities, ~800 classes, ~550k statements)
plus a pure-Python oracle that independently reimplements the pipeline's
rules (taxonomy 7-step, URI priority, shape instances, facts dispatch
for the dates / object-range / anyURI branches, sh:maxCount) from the
generator's ground truth.

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
from .functions.iri import encode_iri_path_py
from .plans.shapes import Schema, sample_schema

ENWIKI = vocab.ENWIKI_ARTICLE_PREFIX
Y = vocab.YAGO_RESOURCE_PREFIX

BAD_ROOT = vocab.WD_BAD_CLASSES[0]
ORPHAN_ROOT = 9_999_999          # unmapped parent: subtree not kept
CLS_BASE = 1_000_000
ENT_BASE = 2_000_000


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
    urls: dict[int, str]
    schema: Schema = field(default_factory=lambda: sample_schema(10))


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
        else:                            # normal: under a root or an earlier class
            pool = root_qids + [CLS_BASE + j for j in range(40, i)]
            parents[q] = [pool[rng.integers(0, len(pool))]]
        cls.append(q)
    class_qid = np.array(cls)

    class_sitelink = {}
    class_label = {}
    for q in cls:
        if rng.random() < 0.7:
            class_sitelink[q] = f"Class_{q}"
        if rng.random() < 0.9:
            class_label[q] = f"ClassLabel{q}"

    # ---- entities ----------------------------------------------------
    ent_qid = ENT_BASE + np.arange(n_entities)
    # class assignment: 20% direct Q5 (hub skew), rest zipf over classes
    gen_classes = class_qid[len(root_qids) + 1:]   # skip roots + bad root
    ranks = np.arange(1, len(gen_classes) + 1)
    weights = 1.0 / ranks
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
    p31 = sorted(set(p31))

    ent_label = {}
    ent_sitelink = {}
    for e in ent_qid:
        e = int(e)
        r = rng.random()
        if r < 0.8:
            ent_label[e] = f"Ent{e}"
        if r < 0.3:
            ent_sitelink[e] = f"Title_{e}"

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

    # ---- statements (flat columns) -------------------------------------
    frames: list[pd.DataFrame] = []

    def flat(pk, s_kind, s_text, s_num, o_kind, o_text, o_num,
             o_lang=None):
        frames.append(pd.DataFrame({
            "pk": pk, "s_kind": s_kind, "s_text": s_text, "s_num": s_num,
            "o_kind": o_kind, "o_text": o_text, "o_num": o_num,
            "o_lang": o_lang,
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

    # url chains: p:P856 + BestRank + ps:P856 → iri
    u_subj = list(urls.keys())
    u_node = [f"su{e}" for e in u_subj]
    u_val = list(urls.values())
    flat("p:P856", "item", None, pd.Series(u_subj, dtype="int64"),
         "blank", u_node, None)
    flat("rdf:type", "blank", u_node, None,
         "iri", vocab.WIKIBASE_BEST_RANK, None)
    flat("ps:P856", "blank", u_node, None, "iri", u_val, None)

    statements = pd.concat(frames, ignore_index=True)
    if "o_lang" not in statements:
        statements["o_lang"] = None

    return GroundTruth(
        statements=statements, root_targets=root_targets,
        class_qid=class_qid, class_parents=parents,
        class_sitelink=class_sitelink, class_label=class_label,
        ent_qid=ent_qid, p31=p31, ent_label=ent_label,
        ent_sitelink=ent_sitelink, births=births, spouses=spouses,
        urls=urls, schema=schema,
    )


def statements_df(spark: SparkSession, gt: GroundTruth) -> DataFrame:
    """Assemble the flat pandas statements into term-struct rows."""
    df = spark.createDataFrame(gt.statements)

    prop_prefix = {
        "wdt": "http://www.wikidata.org/prop/direct/P",
        "p": "http://www.wikidata.org/prop/P",
        "ps": "http://www.wikidata.org/prop/statement/P",
        "psv": "http://www.wikidata.org/prop/statement/value/P",
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
        "schema:about": vocab.SCHEMA_ABOUT,
        "wikibase:timeValue": vocab.WIKIBASE_TIME_VALUE,
        "wikibase:timePrecision": vocab.WIKIBASE_TIME_PRECISION,
        "wikibase:timeCalendarModel": vocab.WIKIBASE_TIME_CALENDAR_MODEL,
    }
    pred_iri = F.lit(None).cast("string")
    for k, full in iri_key.items():
        pred_iri = F.when(pk == k, F.lit(full)).otherwise(pred_iri)

    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    def term(kind, text, num, lang=None):
        return F.struct(
            kind.alias("kind"), text.alias("text"), num.alias("num"),
            F.lit(None).cast("double").alias("dbl"),
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
             lang=F.col("o_lang")).alias("object"),
        F.col("pk").alias("predicate_key"),
    )
    return out


# ---------------------------------------------------------------------
# pure-Python oracle (mirrors plans/taxonomy.py, uri_mapping.py,
# instances.py and the facts dispatch for 3 branches)
# ---------------------------------------------------------------------

@dataclass
class Oracle:
    uri: dict[int, str]
    yago_classes: set[str]
    class_mapping: set[tuple[int, str]]
    sub_class_of: set[tuple[str, str]]
    instances: dict[str, set[str]]           # shape target → entity URIs
    facts: set[tuple[str, str, str]]         # (s_uri, pred, obj repr)


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
            uri[q] = Y + encode_iri_path_py(sitelinks[q])
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

    # --- facts (birthDate dates branch, spouse object branch, url anyURI) --
    S = vocab.SCHEMA
    facts: set[tuple[str, str, str]] = set()
    person = instances[S + "Person"]
    thing = instances[S + "Thing"]
    for e, dates in gt.births.items():
        if uri[e] not in person or len(dates) > 1:
            continue  # domain filter / sh:maxCount 1 group drop
        lex = dates[0][:10]  # precision 11 → xsd:date
        facts.add((uri[e], S + "birthDate",
                   f'"{lex}"^^<{vocab.XSD_DATE}>'))
    for a, b in gt.spouses:
        if uri[a] in person and uri[b] in person:
            facts.add((uri[a], S + "spouse", f"<{uri[b]}>"))
    for e, u in gt.urls.items():
        if uri[e] not in thing or u == "http://[bad":
            continue
        facts.add((uri[e], S + "url", f'"{u}"^^<{vocab.XSD_ANY_URI}>'))

    return Oracle(uri=uri, yago_classes=yago_classes, class_mapping=mapping,
                  sub_class_of=sub_reduced, instances=instances, facts=facts)
