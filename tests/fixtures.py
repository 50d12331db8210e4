"""Deterministic reference-shaped ttl fixtures (FIXTURES.md §1).

Miniature versions of the reference's eight input datasets with the
special cases its operators must handle: lang tags, typed literals with
conflicting datatypes, negative dates, values containing ``^``,
predicates containing ``@``/``~``, geo points, en_uris files, a missing
dataset/language file, and frequency ties for the deterministic
tie-breaks.
"""

from __future__ import annotations

import os
import random


def res(lang: str, name: str) -> str:
    host = "dbpedia.org" if lang == "en" else f"{lang}.dbpedia.org"
    return f"<http://{host}/resource/{name}>"


LABEL_P = "<http://www.w3.org/2000/01/rdf-schema#label>"
SUBJECT_P = "<http://purl.org/dc/terms/subject>"
SAME_AS_P = "<http://www.w3.org/2002/07/owl#sameAs>"
WIKILINK_P = "<http://dbpedia.org/ontology/wikiPageWikiLink>"
POINT_P = "<http://www.georss.org/georss/point>"
RDF_TYPE_P = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
PREF_LABEL_P = "<http://www.w3.org/2004/02/skos/core#prefLabel>"
RELATED_P = "<http://www.w3.org/2004/02/skos/core#related>"
BROADER_P = "<http://www.w3.org/2004/02/skos/core#broader>"
CONCEPT = "<http://www.w3.org/2004/02/skos/core#Concept>"

XSD = "<http://www.w3.org/2001/XMLSchema#{}>"

LANGS = ["de", "en", "vi"]


def prop(lang: str, name: str) -> str:
    host = "dbpedia.org" if lang == "en" else f"{lang}.dbpedia.org"
    return f"<http://{host}/property/{name}>"


def write_ttl(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# started 2026-08-13T00:00:00Z\n")
        for line in lines:
            f.write(line + " .\n")
        f.write("# completed 2026-08-13T00:00:01Z\n")


def generate(root: str, n_subjects: int = 40) -> str:
    """Write the miniature core-i18n tree under ``root``; returns root."""
    rng = random.Random(42)
    for lang in LANGS:
        subjects = [res(lang, f"Article_{i}") for i in range(n_subjects)]

        write_ttl(
            os.path.join(root, lang, f"labels_{lang}.ttl"),
            [f'{s} {LABEL_P} "Label {i} {lang}"@{lang}' for i, s in enumerate(subjects)],
        )

        cats = [res(lang, f"Category:Cat_{i % 5}") for i in range(n_subjects)]
        write_ttl(
            os.path.join(root, lang, f"article_categories_{lang}.ttl"),
            [f"{s} {SUBJECT_P} {c}" for s, c in zip(subjects, cats)],
        )

        links = []
        for s in subjects:
            for other in LANGS + ["fr"]:  # fr is outside the selected set
                if other != lang and rng.random() < 0.5:
                    links.append(f"{s} {SAME_AS_P} {res(other, 'Article_' + str(rng.randrange(n_subjects)))}")
        write_ttl(os.path.join(root, lang, f"interlanguage_links_{lang}.ttl"), links)

        page_links = [
            f"{s} {WIKILINK_P} {res(lang, 'Article_' + str(rng.randrange(n_subjects)))}"
            for s in subjects
            for _ in range(rng.randrange(1, 4))
        ]
        write_ttl(os.path.join(root, lang, f"page_links_{lang}.ttl"), page_links)

        # skos: only for de/en (vi missing -> empty-input fallback)
        if lang != "vi":
            skos_lines = []
            for i in range(8):
                c = res(lang, f"Category:Cat_{i}")
                skos_lines.append(f"{c} {RDF_TYPE_P} {CONCEPT}")
                skos_lines.append(f'{c} {PREF_LABEL_P} "Cat {i}"@{lang}')
                if i > 0:
                    skos_lines.append(f"{c} {BROADER_P} {res(lang, 'Category:Cat_' + str(i - 1))}")
                if i % 2 == 0:
                    skos_lines.append(f"{c} {RELATED_P} {res(lang, 'Category:Cat_' + str((i + 2) % 8))}")
            write_ttl(os.path.join(root, lang, f"skos_categories_{lang}.ttl"), skos_lines)

        geo_lines = [
            f'{s} {POINT_P} "{round(rng.uniform(-90, 90), 4)} {round(rng.uniform(-180, 180), 4)}"'
            for s in subjects[: n_subjects // 2]
        ]
        write_ttl(os.path.join(root, lang, f"geo_coordinates_{lang}.ttl"), geo_lines)

        # infobox: long-tail predicates, mixed datatypes incl. conflicts,
        # negative dates, ^ in values, @/~ in predicate names, ties
        info_lines = []
        date_t, int_t, dbl_t = XSD.format("date"), XSD.format("integer"), XSD.format("double")
        for i, s in enumerate(subjects):
            info_lines.append(f'{s} {prop(lang, "name")} "Name {i}"@{lang}')
            # conflicting types for "pop": mostly integer, some string
            t = int_t if i % 4 != 0 else XSD.format("string")
            info_lines.append(f'{s} {prop(lang, "pop")} "{i * 1000}"^^{t}')
            info_lines.append(f'{s} {prop(lang, "area")} "{i * 1.5}"^^{dbl_t}')
            if i % 3 == 0:
                info_lines.append(f'{s} {prop(lang, "born")} "19{i % 90:02d}-01-02"^^{date_t}')
            if i % 7 == 0:
                info_lines.append(f'{s} {prop(lang, "died")} "-0044-03-15"^^{date_t}')
            if i % 5 == 0:
                info_lines.append(f'{s} {prop(lang, "motto")} "E pluribus ^ unum"^^{XSD.format("string")}')
            if i % 6 == 0:
                info_lines.append(f'{s} {prop(lang, "bad@pred")} "x"')
                info_lines.append(f'{s} {prop(lang, "odd~pred")} "y"')
            if i % 2 == 0:
                info_lines.append(f'{s} {prop(lang, "leader")} {res(lang, "Article_" + str((i + 1) % n_subjects))}')
            # tie pair: tie_a / tie_b appear exactly once per subject half
            if i < 5:
                info_lines.append(f'{s} {prop(lang, "tie_a")} "a"')
                info_lines.append(f'{s} {prop(lang, "tie_b")} "b"')
        write_ttl(os.path.join(root, lang, f"infobox_properties_{lang}.ttl"), info_lines)

        # en_uris companions for non-en languages (subjects are en URIs)
        if lang != "en":
            en_subjects = [res("en", f"Article_{i}") for i in range(10)]
            write_ttl(
                os.path.join(root, lang, f"labels_en_uris_{lang}.ttl"),
                [f'{s} {LABEL_P} "EnLabel {i} {lang}"@{lang}' for i, s in enumerate(en_subjects)],
            )
            write_ttl(
                os.path.join(root, lang, f"infobox_properties_en_uris_{lang}.ttl"),
                [f'{s} {prop("en", "pop")} "{i * 7}"^^{int_t}' for i, s in enumerate(en_subjects)],
            )
    return root
