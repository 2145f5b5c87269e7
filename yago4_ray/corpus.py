"""Deterministic synthetic corpus: a Wikidata-style statement table plus
an interleaved text+media document table.

This is the engine's test/bench input universe (no external data):

- ``statements``   — (subject, predicate, object) canonical N-Triples
  strings covering every operator family in SURVEY.md §2: full p:/ps:/
  psv:/pq: statement chains with BestRank flags, wikibase value nodes
  (time / geo / quantity), labels + sitelinks (incl. percent-encoding
  and unicode titles), a class DAG with <10-instance classes, bad-class
  descendants, disjoint-class and disjoint-instance violations,
  maxCount violations, pattern violations, Freebase ids.
- ``documents``    — the BASELINE.json ``input_hint`` shape:
  (doc_id: string, spans: list<struct<kind, text, media_ref, offset>>).
  Text spans carry mention-linked fact sentences; media spans carry
  commons refs. One deliberately hot entity appears in ~20% of docs to
  exercise shuffle salting.
- ``truthy``       — (doc_id, subject, predicate, object): ground truth
  for the extraction stage (P/R gate).
- ``qid_dictionary`` — (surface_form, qid, priority): the entity-linking
  dictionary loaded once per extraction actor.

Everything derives from one seeded numpy Generator; same (n_entities,
seed) → bit-identical tables in any process.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import terms as T

WDS = "http://www.wikidata.org/entity/statement/"
WDV = "http://www.wikidata.org/value/"
ENWIKI = "https://en.wikipedia.org/wiki/"
COMMONS = "http://commons.wikimedia.org/wiki/Special:FilePath/"

# ---------------------------------------------------------------------------
# Fixed micro-taxonomy (QIDs are the public Wikidata ones)
# ---------------------------------------------------------------------------

# child → parent (wdt:P279 edges) — topology mirrors real Wikidata so the
# vendored full shapes.ttl (ys:fromClass wd:Q215627 for schema:Person,
# wd:Q17334923 for schema:Place, wd:Q1656682 for schema:Event, …) maps
# every entity kind through its real superclass chain.
P279_EDGES = [
    ("Q215627", "Q35120"),     # person ⊂ entity(Thing)
    ("Q5", "Q215627"),         # human ⊂ person (schema:Person fromClass)
    ("Q17334923", "Q35120"),   # location ⊂ entity (schema:Place fromClass)
    ("Q618123", "Q17334923"),  # geographical object ⊂ location
    ("Q515", "Q618123"),       # city ⊂ geographical object
    ("Q6256", "Q618123"),      # country ⊂ geographical object
    ("Q1549591", "Q515"),      # big city ⊂ city
    ("Q43229", "Q35120"),      # organization ⊂ entity
    ("Q5341295", "Q43229"),    # educational organization ⊂ organization
    ("Q38723", "Q5341295"),    # higher-ed institution ⊂ edu org
    ("Q3918", "Q38723"),       # university ⊂ higher-ed institution
    ("Q17537576", "Q35120"),   # creative work ⊂ entity
    ("Q11424", "Q17537576"),   # film ⊂ creative work
    ("Q7889", "Q17537576"),    # video game ⊂ creative work
    ("Q571", "Q17537576"),     # book ⊂ creative work
    ("Q1656682", "Q35120"),    # event ⊂ entity (schema:Event fromClass)
    ("Q1190554", "Q1656682"),  # occurrence ⊂ event
    ("Q34770", "Q35120"),      # language ⊂ entity
    ("Q16521", "Q35120"),      # taxon ⊂ entity
    ("Q901", "Q5"),            # scientist ⊂ human        (no enwiki)
    ("Q82955", "Q5"),          # politician ⊂ human       (<10 instances)
    ("Q22808320", "Q4167410"),  # ⊂ disambiguation page (bad class)
    ("Q15632617", "Q5"),       # fictional human ⊂ human AND
    ("Q15632617", "Q17537576"),  # … ⊂ creative work  → disjoint-class victim
]

# class qid → (english label, has enwiki sitelink)
CLASS_INFO = {
    "Q35120": ("entity", True),
    "Q215627": ("person", True),
    "Q5": ("human", True),
    "Q17334923": ("location", True),
    "Q618123": ("geographical object", True),
    "Q515": ("city", True),
    "Q6256": ("country", True),
    "Q1549591": ("big city", True),
    "Q43229": ("organization", True),
    "Q5341295": ("educational organization", True),
    "Q38723": ("higher education institution", True),
    "Q3918": ("university", True),
    "Q17537576": ("creative work", True),
    "Q11424": ("film", True),
    "Q7889": ("video game", True),
    "Q571": ("book", True),
    "Q1656682": ("event", True),
    "Q1190554": ("occurrence", True),
    "Q34770": ("language", True),
    "Q16521": ("taxon", True),
    "Q901": ("scientist", False),
    "Q82955": ("politician", True),
    "Q4167410": ("Wikimedia disambiguation page", False),
    "Q22808320": ("Wikimedia human name disambiguation page", False),
    "Q15632617": ("fictional human", True),
}

# auxiliary items: units / calendar / globes / gender
AUX_ITEMS = {
    "Q2": "Earth",
    "Q111": "Mars",
    "Q199": "1",
    "Q573": "day",
    "Q7727": "minute",
    "Q11574": "second",
    "Q25235": "hour",
    "Q11573": "metre",
    "Q1985727": "proleptic Gregorian calendar",
    "Q1985786": "proleptic Julian calendar",
    "Q6581097": "male",
    "Q6581072": "female",
}

FIRST_NAMES = [
    "alma", "boris", "carla", "derek", "elena", "farid", "greta", "hugo",
    "irene", "jonas", "karin", "liam", "mira", "nadia", "oskar", "petra",
    "quentin", "rosa", "stefan", "tara", "ulrich", "vera", "wanda", "xavier",
    "yara", "zoltan",
]
LAST_NAMES = [
    "abbott", "bergman", "castillo", "dvorak", "eriksen", "fontaine",
    "grimaldi", "hartmann", "ivanov", "jansen", "kovacs", "lindqvist",
    "moreau", "novak", "olsen", "petrov", "quirk", "rossi", "sundberg",
    "takacs", "ueda", "varga", "weber", "xanthos", "yamada", "zeller",
]
PLACE_STEMS = [
    "spring", "river", "stone", "oak", "elm", "north", "south", "east",
    "west", "lake", "hill", "green", "silver", "iron", "amber", "cedar",
]
PLACE_SUFFIXES = ["field", "ton", "ville", "burg", "stad", "haven", "fjord", "minster"]
ORG_WORDS = ["atlas", "helix", "nimbus", "vertex", "quanta", "solstice", "meridian", "aurora"]
WORK_WORDS = ["shadow", "garden", "winter", "echo", "voyage", "mirror", "horizon", "ember"]
EVENT_WORDS = ["congress", "festival", "summit", "expedition", "uprising", "eclipse"]
TAXON_GENUS = ["quercus", "falco", "salmo", "ursus", "acer", "corvus"]
TAXON_SPECIES = ["alba", "robur", "major", "minor", "vulgaris", "sylvatica"]
LANG_WORDS = ["valdic", "norren", "kastri", "ophel", "tessian", "murelli"]


@dataclass
class _KB:
    statements: list[tuple[str, str, str]] = field(default_factory=list)
    truthy: list[tuple[str, str, str, str]] = field(default_factory=list)  # doc_id,s,p,o
    docs: list[dict] = field(default_factory=list)
    surface_rows: list[tuple[str, str, int]] = field(default_factory=list)

    def st(self, s: str, p: str, o: str):
        self.statements.append((s, p, o))


def _title_case(label: str) -> str:
    return " ".join(w.capitalize() for w in label.split(" "))


class CorpusGenerator:
    """Deterministic generator; see module docstring."""

    def __init__(self, n_entities: int = 1000, seed: int = 42):
        self.n = max(n_entities, 120)  # need room for every special case
        self.rng = np.random.default_rng([seed, self.n])
        self.kb = _KB()
        self._statement_counter: dict[str, int] = {}
        self._surfaces_seen: dict[str, str] = {}

    # -- small helpers ----------------------------------------------------
    def _statement_id(self, qid: str) -> str:
        k = self._statement_counter.get(qid, 0)
        self._statement_counter[qid] = k + 1
        return T.iri(f"{WDS}{qid}-{k}")

    def _value_node(self, qid: str, pid: str, k: int = 0) -> str:
        h = hashlib.sha1(f"{qid}|{pid}|{k}".encode()).hexdigest()[:16]
        return T.iri(f"{WDV}{h}")

    def _chance(self, p: float) -> bool:
        return bool(self.rng.random() < p)

    # -- emission of one full statement chain -----------------------------
    def _fact(
        self,
        qid: str,
        pid: str,
        simple_object: str | None,
        best_rank: bool = True,
        value_node: str | None = None,
        qualifiers: list[tuple[str, str]] | None = None,
        truthy_object: str | None = None,
        doc_id: str | None = None,
    ) -> str:
        """Emit subject --p:pid--> statement --ps:/psv:pid--> object (+rank,
        qualifiers, truthy edge). Returns the statement id."""
        kb = self.kb
        subject = T.wd(qid)
        st_id = self._statement_id(qid)
        kb.st(subject, T.iri(f"{T.P_PREFIX}{pid}"), st_id)
        if best_rank:
            kb.st(st_id, T.RDF_TYPE, T.WIKIBASE_BEST_RANK)
        if simple_object is not None:
            kb.st(st_id, T.iri(f"{T.PS_PREFIX}{pid}"), simple_object)
        if value_node is not None:
            kb.st(st_id, T.iri(f"{T.PSV_PREFIX}{pid}"), value_node)
        for q_pid, q_obj in qualifiers or []:
            if q_obj.startswith("_value_node:"):
                kb.st(st_id, T.iri(f"{T.PQV_PREFIX}{q_pid}"), q_obj.split(":", 1)[1])
            else:
                kb.st(st_id, T.iri(f"{T.PQ_PREFIX}{q_pid}"), q_obj)
        tr = truthy_object if truthy_object is not None else simple_object
        if tr is not None and best_rank:
            kb.st(subject, T.iri(f"{T.WDT}{pid}"), tr)
            if doc_id is not None:
                kb.truthy.append((doc_id, subject, T.iri(f"{T.WDT}{pid}"), tr))
        return st_id

    def _time_value_node(self, qid: str, pid: str, iso: str, precision: int,
                         calendar: str = "Q1985727", k: int = 0) -> str:
        node = self._value_node(qid, pid, k)
        self.kb.st(node, T.WIKIBASE_TIME_VALUE, T.datetime_literal(iso))
        self.kb.st(node, T.WIKIBASE_TIME_PRECISION, T.integer_literal(precision))
        self.kb.st(node, T.WIKIBASE_TIME_CALENDAR_MODEL, T.wd(calendar))
        return node

    def _quantity_value_node(self, qid: str, pid: str, amount: str, unit: str,
                             bounds: tuple[str, str] | None = None, k: int = 0) -> str:
        node = self._value_node(qid, pid, k)
        self.kb.st(node, T.WIKIBASE_QUANTITY_AMOUNT, T.decimal_literal(amount))
        self.kb.st(node, T.WIKIBASE_QUANTITY_UNIT, T.wd(unit))
        if bounds is not None:
            self.kb.st(node, T.WIKIBASE_QUANTITY_LOWER_BOUND, T.decimal_literal(bounds[0]))
            self.kb.st(node, T.WIKIBASE_QUANTITY_UPPER_BOUND, T.decimal_literal(bounds[1]))
        return node

    def _geo_value_node(self, qid: str, pid: str, lat: float, lon: float,
                        precision: float, globe: str = "Q2", k: int = 0) -> str:
        node = self._value_node(qid, pid, k)
        self.kb.st(node, T.WIKIBASE_GEO_LATITUDE, T.double_literal(lat))
        self.kb.st(node, T.WIKIBASE_GEO_LONGITUDE, T.double_literal(lon))
        self.kb.st(node, T.WIKIBASE_GEO_PRECISION, T.double_literal(precision))
        self.kb.st(node, T.WIKIBASE_GEO_GLOBE, T.wd(globe))
        return node

    # -- entity scaffolding ------------------------------------------------
    def _register_surface(self, surface: str, qid: str) -> str:
        """Register a surface form; on collision the earlier (lower-priority
        number) registration wins and the caller gets a disambiguated
        surface for this qid."""
        if surface not in self._surfaces_seen:
            self._surfaces_seen[surface] = qid
            self.kb.surface_rows.append((surface, qid, len(self.kb.surface_rows)))
            return surface
        if self._surfaces_seen[surface] == qid:
            return surface
        disamb = f"{surface} ({qid.lower()})"
        return self._register_surface(disamb, qid)

    def _item(self, qid: str, label: str | None, classes: list[str],
              enwiki_title: str | None = None, langs: tuple[str, ...] = (),
              description: str | None = None, alt_labels: tuple[str, ...] = ()):
        kb = self.kb
        subject = T.wd(qid)
        kb.st(subject, T.RDF_TYPE, T.WIKIBASE_ITEM)
        for c in classes:
            self._fact(qid, "P31", T.wd(c))
        if label is not None:
            kb.st(subject, T.SKOS_PREF_LABEL, T.lang_string(label, "en"))
            for lg in langs:
                kb.st(subject, T.SKOS_PREF_LABEL, T.lang_string(f"{label} ({lg})", lg))
        for alt in alt_labels:
            kb.st(subject, T.SKOS_ALT_LABEL, T.lang_string(alt, "en"))
        if description is not None:
            kb.st(subject, T.SCHEMA_DESCRIPTION, T.lang_string(description, "en"))
        if enwiki_title is not None:
            kb.st(T.iri(ENWIKI + enwiki_title), T.SCHEMA_ABOUT, subject)

    # -- generation --------------------------------------------------------
    def generate(self) -> dict[str, pa.Table]:
        rng = self.rng
        n = self.n

        # taxonomy scaffolding
        for child, parent in P279_EDGES:
            self._fact(child, "P279", T.wd(parent))
        for cq, (label, has_wiki) in CLASS_INFO.items():
            title = _title_case(label).replace(" ", "_") if has_wiki else None
            self._item(cq, label, [], enwiki_title=title,
                       description=f"class of {label}")
        for aq, label in AUX_ITEMS.items():
            self._item(aq, label, [], enwiki_title=None)

        # entity universe: allocate ids deterministically
        base = 1_000_000
        specs = []  # (qid, kind, classes)
        # class share table; 'person' is the hot hub class (skew by design)
        kinds = rng.choice(
            ["person", "scientist", "politician", "city", "bigcity", "country",
             "org", "university", "work", "movie", "game", "book", "event",
             "taxon", "language", "bad", "disjoint_class",
             "disjoint_instance", "plain"],
            size=n,
            p=[0.29, 0.06, 0.006, 0.08, 0.024, 0.01,
               0.06, 0.03, 0.07, 0.04, 0.03, 0.03, 0.05, 0.05,
               0.02, 0.04, 0.016, 0.014, 0.08],
        )
        # pin the first few to guarantee coverage at any n
        pinned = ["person", "person", "city", "org", "work", "event", "taxon",
                  "scientist", "politician", "politician", "politician",
                  "bad", "disjoint_class", "disjoint_instance", "language",
                  "country", "bigcity", "university", "movie", "game", "book",
                  "book"]
        kinds[: len(pinned)] = pinned

        kind_classes = {
            "person": ["Q5"], "scientist": ["Q901"], "politician": ["Q82955"],
            "city": ["Q515"], "bigcity": ["Q1549591"], "country": ["Q6256"],
            "org": ["Q43229"], "university": ["Q3918"], "work": ["Q17537576"],
            "movie": ["Q11424"], "game": ["Q7889"], "book": ["Q571"],
            "event": ["Q1190554"],
            "taxon": ["Q16521"], "language": ["Q34770"], "bad": ["Q22808320"],
            "disjoint_class": ["Q15632617"], "disjoint_instance": ["Q5", "Q618123"],
            "plain": [],
        }
        person_like = {"person", "scientist", "politician", "disjoint_instance"}
        place_like = {"city", "bigcity", "country"}
        org_like = {"org", "university"}
        work_like = {"work", "movie", "game", "book"}

        entities: list[dict] = []
        for i in range(n):
            qid = f"Q{base + i}"
            kind = str(kinds[i])
            ent = {"qid": qid, "kind": kind, "classes": kind_classes[kind]}
            entities.append(ent)

        # labels / surfaces
        for i, ent in enumerate(entities):
            kind = ent["kind"]
            if kind in person_like:
                label = (
                    f"{FIRST_NAMES[int(rng.integers(len(FIRST_NAMES)))]} "
                    f"{LAST_NAMES[int(rng.integers(len(LAST_NAMES)))]}"
                )
            elif kind in place_like:
                label = (
                    PLACE_STEMS[int(rng.integers(len(PLACE_STEMS)))]
                    + PLACE_SUFFIXES[int(rng.integers(len(PLACE_SUFFIXES)))]
                )
            elif kind in org_like:
                label = (
                    f"{ORG_WORDS[int(rng.integers(len(ORG_WORDS)))]} "
                    f"{['institute', 'labs', 'foundation', 'works'][int(rng.integers(4))]}"
                )
            elif kind in work_like:
                label = (
                    f"the {WORK_WORDS[int(rng.integers(len(WORK_WORDS)))]} "
                    f"{WORK_WORDS[int(rng.integers(len(WORK_WORDS)))]}"
                )
            elif kind == "event":
                label = (
                    f"{PLACE_STEMS[int(rng.integers(len(PLACE_STEMS)))]} "
                    f"{EVENT_WORDS[int(rng.integers(len(EVENT_WORDS)))]}"
                )
            elif kind == "taxon":
                label = (
                    f"{TAXON_GENUS[int(rng.integers(len(TAXON_GENUS)))]} "
                    f"{TAXON_SPECIES[int(rng.integers(len(TAXON_SPECIES)))]}"
                )
            elif kind == "language":
                label = LANG_WORDS[int(rng.integers(len(LANG_WORDS)))]
            else:
                label = f"item {i}"
            ent["has_label"] = bool(rng.random() < 0.92)
            ent["label"] = label if ent["has_label"] else None
            # unicode + slash specials (URI-encoding vectors)
            if i == 3:
                ent["label"], ent["has_label"] = "jürgen dürst", True
            if i == 4:
                ent["label"], ent["has_label"] = "paris hilton/bio", True
            ent["has_wiki"] = bool(ent["has_label"] and rng.random() < 0.72)
            ent["surface"] = (
                self._register_surface(ent["label"], ent["qid"])
                if ent["has_label"]
                else None
            )

        # emit items
        for ent in entities:
            title = None
            if ent["has_wiki"]:
                title = _title_case(ent["label"]).replace(" ", "_")
            langs = ("de", "fr") if self._chance(0.3) else ()
            alt = ()
            if ent["has_label"] and self._chance(0.2):
                alt = (f"the {ent['label']}",)
                self._register_surface(alt[0], ent["qid"])
            desc = f"a synthetic {ent['kind']}" if self._chance(0.7) else None
            self._item(ent["qid"], ent["label"], ent["classes"],
                       enwiki_title=title, langs=langs,
                       description=desc, alt_labels=alt)

        # index pools for cross-references
        persons = [e for e in entities if e["kind"] in ("person", "scientist")]
        places = [e for e in entities if e["kind"] in place_like]
        orgs = [e for e in entities if e["kind"] in org_like]
        hub = persons[0]  # the hot entity: spouse/author of ~20% of docs

        def pick(pool):
            return pool[int(rng.integers(len(pool)))]

        # facts + documents
        for ent in entities:
            qid, kind = ent["qid"], ent["kind"]
            doc_id = f"doc-{qid}"
            spans: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
            subject_surface = ent["surface"]
            span_doc = doc_id if subject_surface is not None else None

            def fact_span(pid: str, object_repr: str):
                if subject_surface is not None:
                    spans.append(
                        ("text", f"{subject_surface} | {pid} | {object_repr}", "")
                    )

            def entity_fact(pid: str, obj_ent: dict, best=True, quals=None):
                # ground truth only when a span can carry the fact
                linkable = bool(subject_surface and obj_ent["surface"])
                self._fact(qid, pid, T.wd(obj_ent["qid"]), best_rank=best,
                           qualifiers=quals,
                           doc_id=doc_id if linkable else None)
                if best and linkable:
                    fact_span(pid, obj_ent["surface"])

            if kind in person_like and kind != "disjoint_instance":
                # birth date (time value node, mixed precisions + rejects)
                year = 1900 + int(rng.integers(100))
                month = 1 + int(rng.integers(12))
                day = 1 + int(rng.integers(28))
                precision = [9, 10, 11, 11, 11, 14][int(rng.integers(6))]
                calendar = "Q1985727" if rng.random() < 0.93 else "Q1985786"
                iso = f"{year:04d}-{month:02d}-{day:02d}T00:00:00+00:00"
                node = self._time_value_node(qid, "P569", iso, precision, calendar)
                best = bool(rng.random() < 0.88)
                self._fact(qid, "P569", T.datetime_literal(iso), best_rank=best,
                           value_node=node, truthy_object=T.datetime_literal(iso),
                           doc_id=span_doc)
                if best and subject_surface:
                    fact_span("P569", iso)
                # birth place
                if places and self._chance(0.8):
                    entity_fact("P19", pick(places), best=bool(rng.random() < 0.9))
                # spouse (hub skew ~20% of persons) with date qualifiers
                if self._chance(0.5):
                    partner = hub if rng.random() < 0.4 and ent is not hub else pick(persons)
                    if partner is not ent:
                        sy = 1950 + int(rng.integers(60))
                        q_node = self._time_value_node(
                            qid, "P580q", f"{sy:04d}-06-01T00:00:00+00:00", 11)
                        quals = [("P580", f"_value_node:{q_node}")]
                        if self._chance(0.4):
                            e_node = self._time_value_node(
                                qid, "P582q", f"{sy + 5:04d}-06-01T00:00:00+00:00", 9)
                            quals.append(("P582", f"_value_node:{e_node}"))
                        entity_fact("P26", partner, best=bool(rng.random() < 0.9),
                                    quals=quals)
                # url (maxCount 1; ~8% violate with two best-rank urls)
                if self._chance(0.5):
                    url = f"https://{qid.lower()}.example.org/"
                    self._fact(qid, "P856", T.iri(url),
                               truthy_object=T.typed_literal(url, T.XSD_ANY_URI),
                               doc_id=span_doc)
                    if subject_surface:
                        fact_span("P856", url)
                    if self._chance(0.16):
                        url2 = f"https://www.{qid.lower()}.example.org/"
                        self._fact(qid, "P856", T.iri(url2),
                                   truthy_object=T.typed_literal(url2, T.XSD_ANY_URI),
                                   doc_id=span_doc)
                        if subject_surface:
                            fact_span("P856", url2)
                # image (media span; ~10% invalid refs)
                if self._chance(0.4):
                    ok = rng.random() < 0.9
                    img = (
                        f"{COMMONS}{qid}_portrait.jpg"
                        if ok
                        else f"https://example.org/img/{qid}.jpg"
                    )
                    self._fact(qid, "P18", T.iri(img), doc_id=None)
                    spans.append(("media", "", img))
                # freebase id (~25%, some invalid)
                if self._chance(0.25):
                    ok = rng.random() < 0.8
                    mid = (
                        f"/m/0{qid.lower()[1:6]}" if ok else f"/x/{qid.lower()}"
                    )
                    self._fact(qid, "P646", T.string_literal(mid), doc_id=span_doc)
                    if subject_surface:
                        fact_span("P646", mid)

            elif kind == "disjoint_instance":
                # typed Person AND Place: removed from all shapes (G5)
                if places and self._chance(0.8):
                    entity_fact("P19", pick(places))

            elif kind in place_like:
                # geo coordinates (some non-Earth rejects)
                lat = round(float(rng.uniform(-80, 80)), 4)
                lon = round(float(rng.uniform(-179, 179)), 4)
                precision = [0.1, 0.01, 1.0 / 3600][int(rng.integers(3))]
                globe = "Q2" if rng.random() < 0.94 else "Q111"
                node = self._geo_value_node(qid, "P625", lat, lon, precision, globe)
                self._fact(qid, "P625", None, value_node=node,
                           best_rank=bool(rng.random() < 0.95))
                # elevation: full quantity with bounds, unit metre
                if self._chance(0.6):
                    amount = int(rng.integers(-100, 4000))
                    node = self._quantity_value_node(
                        qid, "P2044", f"+{amount}" if amount >= 0 else str(amount),
                        "Q11573", bounds=(str(amount - 1), f"+{amount + 1}"))
                    self._fact(qid, "P2044", None, value_node=node)

            elif kind in org_like:
                # numberOfEmployees: integer quantity (unit Q199)
                if self._chance(0.7):
                    emp = int(rng.integers(1, 200000))
                    # full quantity node (bounds + unit Q199 "1"): the real
                    # Organization shape maps numberOfEmployees via
                    # sh:node schema:QuantitativeValue (shapes.ttl:1333-1337)
                    node = self._quantity_value_node(
                        qid, "P1128", f"+{emp}", "Q199",
                        bounds=(str(emp - 1), f"+{emp + 1}"))
                    self._fact(qid, "P1128", None, value_node=node,
                               truthy_object=T.decimal_literal(f"+{emp}"),
                               doc_id=span_doc)
                    if subject_surface:
                        fact_span("P1128", f"+{emp}")
                # leiCode (pattern; ~25% violate)
                if self._chance(0.5):
                    ok = rng.random() < 0.75
                    lei = (
                        "".join(str(rng.integers(10)) for _ in range(18)) + "00"
                        if ok
                        else f"LEI-{qid}"
                    )
                    self._fact(qid, "P1278", T.string_literal(lei), doc_id=span_doc)
                    if subject_surface:
                        fact_span("P1278", lei)

            elif kind in work_like:
                # isbn: only books carry it (schema:Book shape,
                # shapes.ttl:366-379); ISBN-10 form passes the shape's
                # pattern, ~30% violate
                if kind == "book" and self._chance(0.9):
                    ok = rng.random() < 0.7
                    isbn = (
                        "".join(str(rng.integers(10)) for _ in range(9))
                        + ["0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
                           "X"][int(rng.integers(11))]
                        if ok
                        else f"isbn-{qid}"
                    )
                    self._fact(qid, "P212", T.string_literal(isbn), doc_id=span_doc)
                    if subject_surface:
                        fact_span("P212", isbn)
                # duration (quantity in s/min/h/day; some invalid unit; one negative)
                if self._chance(0.5):
                    unit = ["Q11574", "Q7727", "Q25235", "Q573", "Q11573"][
                        int(rng.integers(5))
                    ]
                    amount = int(rng.integers(1, 240))
                    if self._chance(0.05):
                        amount = -amount
                    node = self._quantity_value_node(
                        qid, "P2047", f"+{amount}" if amount >= 0 else str(amount), unit)
                    self._fact(qid, "P2047", None, value_node=node)
                # author (sh:or Person|Organization)
                if self._chance(0.7):
                    author = (
                        hub
                        if rng.random() < 0.35
                        else (pick(persons) if rng.random() < 0.8 else pick(orgs))
                    )
                    entity_fact("P50", author, best=bool(rng.random() < 0.92))

            elif kind == "event":
                if places and self._chance(0.8):
                    entity_fact("P276", pick(places))

            elif kind == "taxon":
                genus = ent["label"] or "ignotus ignotus"
                self._fact(qid, "P225", T.string_literal(_title_case(genus)),
                           doc_id=span_doc)
                if subject_surface:
                    fact_span("P225", _title_case(genus))

            # assemble interleaved doc (lead text span + fact/media spans)
            if ent["has_label"]:
                spans.insert(0, ("text", f"about {ent['label']}.", ""))
            doc_spans = [
                {"kind": k, "text": t, "media_ref": m, "offset": j}
                for j, (k, t, m) in enumerate(spans)
            ]
            self.kb.docs.append({"doc_id": doc_id, "spans": doc_spans})

        return self._to_tables()

    # -- materialization ---------------------------------------------------
    def _to_tables(self) -> dict[str, pa.Table]:
        kb = self.kb
        statements = pa.table(
            {
                "subject": [s for s, _, _ in kb.statements],
                "predicate": [p for _, p, _ in kb.statements],
                "object": [o for _, _, o in kb.statements],
            }
        )
        span_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        documents = pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in kb.docs], pa.string()),
                "spans": pa.array([d["spans"] for d in kb.docs], span_type),
            }
        )
        truthy = pa.table(
            {
                "doc_id": [r[0] for r in kb.truthy],
                "subject": [r[1] for r in kb.truthy],
                "predicate": [r[2] for r in kb.truthy],
                "object": [r[3] for r in kb.truthy],
            }
        )
        qid_dictionary = pa.table(
            {
                "surface_form": [r[0] for r in kb.surface_rows],
                "qid": [r[1] for r in kb.surface_rows],
                "priority": pa.array([r[2] for r in kb.surface_rows], pa.int32()),
            }
        )
        return {
            "statements": statements,
            "documents": documents,
            "truthy": truthy,
            "qid_dictionary": qid_dictionary,
        }


def generate_corpus(n_entities: int = 1000, seed: int = 42) -> dict[str, pa.Table]:
    return CorpusGenerator(n_entities, seed).generate()


def materialize_corpus(
    n_entities: int = 1000,
    seed: int = 42,
    cache_root: str = "/tmp/yago4_ray_cache",
) -> str:
    """Write (or reuse) the corpus parquet files; returns the directory.
    Layout: one parquet file per table + a _COMPLETE marker for atomicity."""
    out = os.path.join(cache_root, f"corpus_n{n_entities}_s{seed}_v4")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tables = generate_corpus(n_entities, seed)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    # big tables are written as a *directory* of part files (named
    # <table>.parquet so read_parquet call sites are unchanged): one
    # 300 MB file caps Ray's read parallelism at a handful of blocks.
    # documents chunk smaller — each part feeds one extraction task, so
    # the actor pool needs >= pool-size parts to saturate
    chunk_sizes = {"documents": 20_000}
    for name, table in tables.items():
        chunk_rows = chunk_sizes.get(name, 100_000)
        target = os.path.join(tmp, f"{name}.parquet")
        if table.num_rows > chunk_rows:
            os.makedirs(target, exist_ok=True)
            for i, start in enumerate(range(0, table.num_rows, chunk_rows)):
                pq.write_table(
                    table.slice(start, chunk_rows),
                    os.path.join(target, f"part-{i:04d}.parquet"),
                )
        else:
            pq.write_table(table, target)
    if os.path.exists(out):  # stale partial dir
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out
