"""FHIR-search frontend tests (SURVEY.md §2.7) over FHIR-shaped frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.plans.search import (
    SearchConfig,
    SearchEngine,
    encode_page_token,
)


@pytest.fixture(scope="module")
def engine(spark):
    patients = spark.createDataFrame(
        [
            ("p1", "female", "1980-05-01", "everywoman"),
            ("p2", "male", "1990-01-01", "smith"),
            ("p3", "female", "2001-12-12", "smith"),
        ],
        ["id", "gender", "birthDate", "family"],
    )
    observations = spark.createDataFrame(
        [
            ("o1", "Patient/p1", "8480-6", "2024-01-01",
             [{"system": "http://loinc.org", "code": "8480-6"}]),
            ("o2", "Patient/p1", "718-7", "2024-02-01",
             [{"system": "http://loinc.org", "code": "718-7"}]),
            ("o3", "Patient/p2", "8480-6", "2024-03-01", None),
        ],
        "id string, subject_ref string, code string, effective string,"
        " coding array<struct<system:string,code:string>>",
    )
    configs = {
        "Patient": SearchConfig(params={"name": "family"}, string_params={"name"}),
        "Observation": SearchConfig(
            params={"date": "effective"},
            reference_params={"subject": ("subject_ref", "Patient")},
            token_params={"code_token": "coding"},
        ),
    }
    return SearchEngine({"Patient": patients, "Observation": observations}, configs)


def test_array_string_search_humanname(spark):
    # the SURVEY §2.7 'string prefix search' row: ?name=eve over
    # array<struct<family,given>> HumanName columns
    patients = spark.createDataFrame(
        [("p1", [{"family": "Everywoman", "given": ["Eve"]}]),
         ("p2", [{"family": "Smith", "given": ["Bob"]}]),
         ("p3", None)],
        "id string, name array<struct<family:string,given:array<string>>>",
    )
    eng = SearchEngine(
        {"Patient": patients},
        {"Patient": SearchConfig(array_string_params={"name": ("name", "family")})},
    )
    assert [r["id"] for r in eng.search("Patient", {"name": "eve"}).collect()] == ["p1"]
    assert [r["id"] for r in eng.search("Patient", {"name:contains": "MIT"}).collect()] == ["p2"]
    assert eng.search("Patient", {"name:exact": "eve"}).count() == 0
    assert [r["id"] for r in eng.search("Patient", {"name": "eve,smi"}).collect()] == ["p1", "p2"]


def test_string_value_not_misparsed_as_prefix(spark):
    # "george" starts with 'ge' but is a name, not >= 'orge'
    patients = spark.createDataFrame(
        [("p1", "george"), ("p2", "orwell")], ["id", "family"]
    )
    eng = SearchEngine(
        {"Patient": patients},
        {"Patient": SearchConfig(params={"name": "family"}, string_params={"name"})},
    )
    assert [r["id"] for r in eng.search("Patient", {"name": "george"}).collect()] == ["p1"]


def test_string_search_case_insensitive_regardless_of_value_case(engine):
    # FHIR string search: `?name=Eve` ≡ `?name=eve` (class-driven, not
    # keyed on the query value's capitalization — VERDICT r1 #3/#5)
    lower = {r["id"] for r in engine.search("Patient", {"name": "eve"}).collect()}
    upper = {r["id"] for r in engine.search("Patient", {"name": "Eve"}).collect()}
    assert lower == upper == {"p1"}
    # unconfigured params keep token semantics: exact, case-sensitive
    assert engine.search("Patient", {"gender": "Female"}).count() == 0


def test_chained_and_has_no_mandatory_broadcast(engine):
    # VERDICT r1 "What's wrong" #1: the chained/_has key set must not be
    # force-broadcast (unbounded at scale). The plan should be a plain
    # LeftSemi join with no broadcast hint; AQE may still choose BHJ at
    # runtime, which is exactly the point.
    for q in ({"subject.name": "eve"}, ):
        df = engine.search("Observation", q)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed and "broadcast" not in analyzed.lower()
        assert "LeftSemi" in df._jdf.queryExecution().optimizedPlan().toString()
    df = engine.search("Patient", {"_has:Observation:subject:code": "8480-6"})
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "broadcast" not in analyzed.lower()
    assert "LeftSemi" in df._jdf.queryExecution().optimizedPlan().toString()


def test_has_chained_subparam_and_nested_has(spark):
    # NOTES r2 #7 / VERDICT r2 next-#7: the part after `_has:Type:ref:`
    # is evaluated as a search on the source type, so chained sub-params
    # and nested _has compose.
    patients = spark.createDataFrame(
        [("p1", "everywoman"), ("p2", "smith")], ["id", "family"]
    )
    encounters = spark.createDataFrame(
        [("e1", "Patient/p1"), ("e2", "Patient/p2")], ["id", "subject_ref"]
    )
    observations = spark.createDataFrame(
        [
            ("o1", "Encounter/e1", "Patient/p1", "8480-6"),
            ("o2", "Encounter/e2", "Patient/p2", "718-7"),
        ],
        ["id", "encounter_ref", "subject_ref", "code"],
    )
    eng = SearchEngine(
        {"Patient": patients, "Encounter": encounters, "Observation": observations},
        {
            "Patient": SearchConfig(params={"name": "family"}, string_params={"name"}),
            "Encounter": SearchConfig(
                reference_params={"subject": ("subject_ref", "Patient")}
            ),
            "Observation": SearchConfig(
                reference_params={
                    "encounter": ("encounter_ref", "Encounter"),
                    "subject": ("subject_ref", "Patient"),
                }
            ),
        },
    )
    # chained sub-param: Encounters having an Observation whose subject's
    # name starts with 'eve'
    got = eng.search("Encounter", {"_has:Observation:encounter:subject.name": "eve"})
    assert [r["id"] for r in got.collect()] == ["e1"]
    # nested _has: Patients having an Encounter that has an Observation
    # with code 718-7
    got = eng.search(
        "Patient", {"_has:Encounter:subject:_has:Observation:encounter:code": "718-7"}
    )
    assert [r["id"] for r in got.collect()] == ["p2"]
    # modifier on the sub-param flows through (`:exact` on a string param
    # defeats the prefix semantics)
    assert (
        eng.search(
            "Encounter", {"_has:Observation:encounter:subject.name:exact": "eve"}
        ).count()
        == 0
    )
    # still no forced broadcast anywhere in the composed plan
    df = eng.search(
        "Patient", {"_has:Encounter:subject:_has:Observation:encounter:code": "718-7"}
    )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "broadcast" not in analyzed.lower()


def test_chained_sort_key(engine):
    # `_sort=subject.name`: order Observations by the referenced
    # Patient's name; the join-in sort column is dropped from the result
    out = engine.search("Observation", {"_sort": "subject.name"})
    ids = [r["id"] for r in out.collect()]
    # o1/o2 → p1 (everywoman), o3 → p2 (smith): stable tie-break not
    # guaranteed unpaged, so assert the group order
    assert set(ids[:2]) == {"o1", "o2"} and ids[2] == "o3"
    assert not any(c.startswith("_sort_") for c in out.columns)
    desc = [r["id"] for r in engine.search(
        "Observation", {"_sort": "-subject.name"}).collect()]
    assert desc[0] == "o3"
    # paged chained sort keeps the sort column so tokens can be built,
    # and the composite keyset walk loses no rows
    p1 = engine.search(
        "Observation", {"_sort": "subject.name", "_count": "2"}
    ).collect()
    assert "_sort_0" in p1[0].asDict()
    tok = encode_page_token(p1[-1]["_sort_0"], p1[-1]["id"])
    p2 = engine.search(
        "Observation",
        {"_sort": "subject.name", "_count": "2", "_page_token": tok},
    ).collect()
    assert [r["id"] for r in p1] + [r["id"] for r in p2] == ["o1", "o2", "o3"]


def test_unknown_param_clear_error(engine):
    with pytest.raises(ValueError, match="unknown search parameter 'bogus'"):
        engine.search("Patient", {"bogus": "x"})


def test_from_store(spark, tmp_path):
    from healthcare_api_spark.sources.store import ResourceStore

    store = ResourceStore(spark, str(tmp_path / "s"))
    store.import_resources(
        spark.createDataFrame([("p1", "female"), ("p2", "male")], ["id", "gender"]), "Patient"
    )
    eng = SearchEngine.from_store(store, {"Patient": SearchConfig()})
    assert eng.search("Patient", {"gender": "female"}).count() == 1


def test_token_system_code(engine):
    out = engine.search("Observation", {"code_token": "http://loinc.org|8480-6"})
    assert [r["id"] for r in out.collect()] == ["o1"]
    # system-less form matches any system
    out = engine.search("Observation", {"code_token": "|718-7"})
    assert [r["id"] for r in out.collect()] == ["o2"]


def test_token_bare_code_and_comma_or(engine):
    # FHIR token grammar: a bare code matches ANY system; comma = OR
    out = engine.search("Observation", {"code_token": "718-7"})
    assert [r["id"] for r in out.collect()] == ["o2"]
    out = engine.search("Observation", {"code_token": "718-7,8480-6"})
    assert sorted(r["id"] for r in out.collect()) == ["o1", "o2"]
    # bare code does NOT prefix-match (token class, not string class)
    assert engine.search("Observation", {"code_token": "718"}).count() == 0


def test_array_param_token_class_exact(spark):
    # identifier-shaped array param: token class = exact equality on the
    # struct field, no case-insensitive prefix semantics
    patients = spark.createDataFrame(
        [("p1", [{"value": "MRN-001"}]), ("p2", [{"value": "MRN-0012"}])],
        "id string, identifier array<struct<value:string>>",
    )
    eng = SearchEngine(
        {"Patient": patients},
        {"Patient": SearchConfig(
            array_string_params={"identifier": ("identifier", "value")},
            token_class_params={"identifier"},
        )},
    )
    assert [r["id"] for r in eng.search("Patient", {"identifier": "MRN-001"}).collect()] == ["p1"]
    # prefix of a longer identifier matches nothing (would match both
    # under string-class semantics)
    assert eng.search("Patient", {"identifier": "MRN-00"}).count() == 0
    # :contains stays available explicitly
    assert eng.search("Patient", {"identifier:contains": "mrn-00"}).count() == 2


def test_not_modifier_includes_absent(spark):
    patients = spark.createDataFrame(
        [("p1", "female"), ("p2", "male"), ("p3", None)], ["id", "gender"]
    )
    eng = SearchEngine({"Patient": patients}, {"Patient": SearchConfig()})
    out = eng.search("Patient", {"gender:not": "female"})
    # :not matches non-matching AND absent values (FHIR semantics)
    assert sorted(r["id"] for r in out.collect()) == ["p2", "p3"]
    # comma-OR under :not = none of the values match
    out = eng.search("Patient", {"gender:not": "female,male"})
    assert [r["id"] for r in out.collect()] == ["p3"]


def test_missing_modifier(engine):
    out = engine.search("Observation", {"coding:missing": "true"})
    assert [r["id"] for r in out.collect()] == ["o3"]
    out = engine.search("Observation", {"coding:missing": "false"})
    assert sorted(r["id"] for r in out.collect()) == ["o1", "o2"]


def test_token_filter(engine):
    out = engine.search("Patient", {"gender": "female"})
    assert sorted(r["id"] for r in out.collect()) == ["p1", "p3"]


def test_string_prefix_and_exact(engine):
    assert {r["id"] for r in engine.search("Patient", {"name": "eve"}).collect()} == {"p1"}
    assert engine.search("Patient", {"name:exact": "eve"}).count() == 0
    assert {r["id"] for r in engine.search("Patient", {"name:contains": "MIT"}).collect()} == {
        "p2", "p3"}


def test_or_values_and_prefix_ops(engine):
    out = engine.search("Patient", {"birthDate": "ge1990-01-01"})
    assert sorted(r["id"] for r in out.collect()) == ["p2", "p3"]
    out = engine.search("Observation", {"date": "ge2024-01-15,lt2024-01-10"})
    assert sorted(r["id"] for r in out.collect()) == ["o1", "o2", "o3"]


def test_reference_filter(engine):
    out = engine.search("Observation", {"subject": "Patient/p1"})
    assert sorted(r["id"] for r in out.collect()) == ["o1", "o2"]


def test_chained_search(engine):
    # ?subject.name=eve → join Patient, prefix-match family
    out = engine.search("Observation", {"subject.name": "eve"})
    assert sorted(r["id"] for r in out.collect()) == ["o1", "o2"]


def test_reverse_chain_has(engine):
    # Patients having an Observation with code=8480-6
    out = engine.search("Patient", {"_has:Observation:subject:code": "8480-6"})
    assert sorted(r["id"] for r in out.collect()) == ["p1", "p2"]


def test_total_count_sort_elements(engine):
    total = engine.search("Patient", {"gender": "female", "_total": "accurate"})
    assert total.collect()[0]["total"] == 2

    out = engine.search("Patient", {"_sort": "-birthDate", "_count": "2",
                                     "_elements": "id,birthDate"})
    rows = out.collect()
    assert [r["id"] for r in rows] == ["p3", "p2"] and rows[0].asDict().keys() == {
        "id", "birthDate"}


def test_include_revinclude_as_params(engine):
    # the documented grammar: _include/_revinclude inside search()
    rows = {
        r["id"]: r
        for r in engine.search(
            "Observation",
            {"subject": "Patient/p1", "_include": "Observation:subject"},
        ).collect()
    }
    assert rows["o1"]["included_subject"]["gender"] == "female"

    rows = {
        r["id"]: r
        for r in engine.search(
            "Patient", {"gender": "female", "_revinclude": "Observation:subject"}
        ).collect()
    }
    assert len(rows["p1"]["revincluded_Observation"]) == 2
    assert rows["p3"]["revincluded_Observation"] is None

    # source type of _include must be the searched type
    with pytest.raises(ValueError, match="_include source"):
        engine.search("Observation", {"_include": "Patient:subject"})

    # _elements keeps the included struct alongside the projection
    out = engine.search(
        "Observation",
        {"_include": "Observation:subject", "_elements": "id"},
    )
    assert set(out.columns) == {"id", "included_subject"}


def test_page_token_keyset(engine):
    first = engine.search("Observation", {"_sort": "date", "_count": "2"}).collect()
    assert [r["id"] for r in first] == ["o1", "o2"]
    tok = encode_page_token(first[-1]["effective"], first[-1]["id"])
    nxt = engine.search(
        "Observation", {"_sort": "date", "_count": "2", "_page_token": tok}
    ).collect()
    assert [r["id"] for r in nxt] == ["o3"]
    # descending paging uses the < bound on the sort key (id tie-break
    # stays ascending)
    desc_first = engine.search("Observation", {"_sort": "-date", "_count": "1"}).collect()
    assert desc_first[0]["id"] == "o3"
    tok = encode_page_token(desc_first[-1]["effective"], desc_first[-1]["id"])
    desc_next = engine.search(
        "Observation", {"_sort": "-date", "_count": "2", "_page_token": tok}
    ).collect()
    assert [r["id"] for r in desc_next] == ["o2", "o1"]
    with pytest.raises(ValueError, match="requires _sort"):
        engine.search("Observation", {"_page_token": "x"})
    # a token missing the id tie-break value is rejected, not misread
    with pytest.raises(ValueError, match="carries 1 value"):
        engine.search(
            "Observation",
            {"_sort": "date", "_page_token": "2024-01-01"},
        )


def test_page_token_non_unique_sort_key(spark):
    # VERDICT r2 "What's wrong" #1: a strict single-key bound drops rows
    # that share the boundary value with the last row of a page. Page
    # size 2 splits the 3-row date groups, so every boundary lands
    # INSIDE a group of ties — the composite (date, id) token must not
    # lose or duplicate any row.
    rows = [
        ("r0", "2024-01-01"), ("r1", "2024-01-01"), ("r2", "2024-01-01"),
        ("r3", "2024-01-02"), ("r4", "2024-01-02"), ("r5", "2024-01-02"),
        ("r6", "2024-01-03"),
    ]
    obs = spark.createDataFrame(rows, ["id", "effective"])
    eng = SearchEngine(
        {"Observation": obs},
        {"Observation": SearchConfig(params={"date": "effective"})},
    )
    seen, tok = [], None
    for _ in range(10):
        params = {"_sort": "date", "_count": "2"}
        if tok is not None:
            params["_page_token"] = tok
        page = eng.search("Observation", params).collect()
        if not page:
            break
        seen += [r["id"] for r in page]
        tok = encode_page_token(page[-1]["effective"], page[-1]["id"])
    assert seen == [f"r{i}" for i in range(7)]


def _page_all(eng, sort, count, key_field):
    seen, tok = [], None
    for _ in range(20):
        params = {"_sort": sort, "_count": str(count)}
        if tok is not None:
            params["_page_token"] = tok
        page = eng.search("Observation", params).collect()
        if not page:
            break
        seen += [r["id"] for r in page]
        tok = encode_page_token(page[-1][key_field], page[-1]["id"])
    return seen


@pytest.mark.parametrize("coltype", ["string", "bigint"])
def test_page_token_null_sort_values_lossless(spark, coltype):
    # ADVICE r3 (medium): encode_page_token mapped None → "" which
    # _typed_lit cast to a typed NULL for numeric/date keys, so the
    # composite bound became NULL and later pages came back EMPTY.
    # NULL sort keys are reachable (dangling chained references). Page
    # size 2 forces boundaries inside the NULL block for both a string
    # and a numeric sort column; asc (NULLs first) and desc (NULLs
    # last) must both visit every row exactly once.
    vals = [None, None, None, "2024-01-01", "2024-01-02", "2024-01-02", None]
    if coltype == "bigint":
        vals = [None if v is None else int(v.replace("-", "")) for v in vals]
    rows = [(f"r{i}", v) for i, v in enumerate(vals)]
    obs = spark.createDataFrame(rows, f"id string, effective {coltype}")
    eng = SearchEngine(
        {"Observation": obs},
        {"Observation": SearchConfig(params={"date": "effective"})},
    )
    asc = _page_all(eng, "date", 2, "effective")
    assert sorted(asc) == [f"r{i}" for i in range(7)]
    # NULLs first on asc: the first two pages are the NULL block
    assert set(asc[:4]) == {"r0", "r1", "r2", "r6"}
    desc = _page_all(eng, "-date", 2, "effective")
    assert sorted(desc) == [f"r{i}" for i in range(7)]
    # NULLs last on desc
    assert set(desc[3:]) == {"r0", "r1", "r2", "r6"}


def test_keyset_page_null_keys_lossless(spark):
    # ADVICE r3 (low): same NULL-boundary gap in the standalone
    # relational.keyset_page — strict >/= comparisons dropped NULL-keyed
    # rows; now a None bound means "past the NULL block".
    from healthcare_api_spark.operators.relational import keyset_page

    rows = [
        ("a", None), ("b", None), ("c", 1), ("d", 1), ("e", 2), ("f", None),
    ]
    df = spark.createDataFrame(rows, "id string, k bigint")
    seen, after = [], None
    for _ in range(10):
        page = keyset_page(df, ["k", "id"], after, 2).collect()
        if not page:
            break
        seen += [r["id"] for r in page]
        after = (page[-1]["k"], page[-1]["id"])
    assert seen == ["a", "b", "f", "c", "d", "e"]


def test_filter_grammar(spark):
    # FHIR _filter expression grammar (advanced-search envelope):
    # and/or precedence, parens, null-safe not(), typed comparators,
    # co/sw/ew string ops, pr presence, quoted strings with spaces
    docs = spark.createDataFrame(
        [
            ("d1", "es", 400, "wiki source"),
            ("d2", "es", 100, "webcrawl"),
            ("d3", "de", 350, None),
            ("d4", "fr", 900, "books"),
            ("d5", "es", 500, "the web"),
        ],
        "doc_id string, lang string, n_chars bigint, source string",
    )
    eng = SearchEngine(
        {"Document": docs},
        {"Document": SearchConfig(string_params={"lang"}, id_col="doc_id")},
    )

    def ids(expr):
        return sorted(
            r["doc_id"]
            for r in eng.search("Document", {"_filter": expr}).collect()
        )

    assert ids('lang eq "es" and n_chars ge 300') == ["d1", "d5"]
    # or binds looser than and
    assert ids('lang eq "fr" or lang eq "de" and n_chars ge 300') == ["d3", "d4"]
    assert ids('(lang eq "fr" or lang eq "de") and n_chars lt 400') == ["d3"]
    # null-safe not(): d3's NULL source must be kept
    assert ids('not(source co "web")') == ["d1", "d3", "d4"]
    assert ids('source pr false') == ["d3"]
    assert ids('source sw "WIKI"') == ["d1"]
    assert ids('source ew "crawl"') == ["d2"]
    # quoted value containing a space
    assert ids('source eq "the web"') == ["d5"]
    assert ids('n_chars gt 100 and n_chars le 500 and not(lang eq "de")') == ["d1", "d5"]

    import pytest as _pytest

    for bad in (
        'lang eq',                     # missing value
        'lang eq "es" garbage extra',  # trailing tokens
        '(lang eq "es"',               # unbalanced paren
        'lang zz "es"',                # unknown operator
        'lang eq "unterminated',       # bad string
        'nope eq "x"',                 # unknown parameter
    ):
        with _pytest.raises(ValueError):
            eng.search("Document", {"_filter": bad}).collect()


def test_include_revinclude(engine):
    obs = engine.search("Observation", {"subject": "Patient/p1"})
    inc = engine.include(obs, "Observation", "subject")
    rows = {r["id"]: r for r in inc.collect()}
    assert rows["o1"]["included_subject"]["gender"] == "female"

    pats = engine.search("Patient", {"gender": "female"})
    rev = engine.revinclude(pats, "Observation", "subject")
    rows = {r["id"]: r for r in rev.collect()}
    assert len(rows["p1"]["revincluded_Observation"]) == 2
    assert rows["p3"]["revincluded_Observation"] is None


def test_text_search_and_of_terms(spark):
    docs = spark.createDataFrame(
        [("d1", "the spark window vector engine"),
         ("d2", "window functions only here"),
         ("d3", "vector store without the other term")],
        ["id", "body"],
    )
    eng = SearchEngine(
        {"Document": docs},
        {"Document": SearchConfig(text_search_col="body")},
    )
    out = eng.search("Document", {"_text": "window vector"})
    assert [r["id"] for r in out.collect()] == ["d1"]
    # single term matches both docs containing it
    assert eng.search("Document", {"_text": "Window"}).count() == 2  # case-folded
    with pytest.raises(ValueError, match="_text is not configured"):
        SearchEngine({"Document": docs}, {"Document": SearchConfig()}).search(
            "Document", {"_text": "x"}
        )


def test_inverted_index_search(spark):
    from healthcare_api_spark.operators.textops import (
        build_inverted_index,
        search_all_tokens,
    )

    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma alpha"), ("d2", "beta gamma"), ("d3", "alpha")],
        ["id", "body"],
    )
    idx = build_inverted_index(docs, "id", "body")
    # posting list is per-doc distinct
    assert idx.filter("tok = 'alpha'").count() == 2
    got = sorted(r["id"] for r in search_all_tokens(idx, "id", ["beta", "gamma"]).collect())
    assert got == ["d1", "d2"]
    # duplicate terms in the query don't over-count
    assert sorted(
        r["id"] for r in search_all_tokens(idx, "id", ["ALPHA", "alpha"]).collect()
    ) == ["d1", "d3"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        search_all_tokens(idx, "id", [])


def test_include_iterate_transitive(spark):
    # Observation → Patient (_include) → Organization (_include:iterate),
    # and a self-referential hop (Organization.partOf) stops at the cap
    patients = spark.createDataFrame(
        [("p1", "Organization/o1"), ("p2", None)], ["id", "org_ref"]
    )
    orgs = spark.createDataFrame(
        [("o1", "Organization/o2", "Clinic A"),
         ("o2", None, "Network HQ")],
        ["id", "partof_ref", "name"],
    )
    obs = spark.createDataFrame(
        [("ob1", "Patient/p1"), ("ob2", "Patient/p2")], ["id", "subject_ref"]
    )
    eng = SearchEngine(
        {"Observation": obs, "Patient": patients, "Organization": orgs},
        {
            "Observation": SearchConfig(
                reference_params={"subject": ("subject_ref", "Patient")}
            ),
            "Patient": SearchConfig(
                reference_params={"organization": ("org_ref", "Organization")}
            ),
            "Organization": SearchConfig(
                reference_params={"partof": ("partof_ref", "Organization")}
            ),
        },
    )
    out = eng.search(
        "Observation",
        {
            "_include": "Observation:subject",
            "_include:iterate": "Patient:organization,Organization:partof",
        },
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["ob1"]["included_subject"]["id"] == "p1"
    assert rows["ob1"]["included_subject_organization"]["name"] == "Clinic A"
    # second transitive hop: the org's parent org
    assert rows["ob1"]["included_subject_organization_partof"]["name"] == "Network HQ"
    # dangling chains stay null, never drop the row
    assert rows["ob2"]["included_subject"]["id"] == "p2"
    assert rows["ob2"]["included_subject_organization"] is None
    # self-referential iterate is depth-capped, not infinite
    iter_cols = [c for c in out.columns if "partof" in c]
    assert 1 <= len(iter_cols) <= 3


def test_text_bm25_ranking(spark):
    from healthcare_api_spark.plans.search import SearchConfig, SearchEngine

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pie"),       # tf=3, short → top
            (2, "apple and a very long tail of many other words here now"),
            (3, "apple pie"),                   # tf=1 but shortest doc
            (4, "no match at all"),
        ],
        ["doc_id", "text"],
    )
    eng = SearchEngine(
        tables={"Doc": docs},
        configs={"Doc": SearchConfig(id_col="doc_id", text_search_col="text")},
    )
    out = eng.search(
        "Doc", {"_text": "apple", "_sort": "-_score,doc_id", "_count": "10"}
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 4 not in ids                      # _text still filters
    assert ids[0] == 1                       # highest tf, short doc
    scores = [r["_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_sort_score_without_text_raises(spark):
    from healthcare_api_spark.plans.search import SearchConfig, SearchEngine

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    eng = SearchEngine(
        tables={"Doc": docs},
        configs={"Doc": SearchConfig(id_col="doc_id", text_search_col="text")},
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_score"):
        eng.search("Doc", {"_sort": "-_score"}).collect()


def test_cli_search_subcommand(spark, tmp_path):
    import json
    import subprocess
    import sys

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "es", 100), (2, "de", 300), (3, "es", 400)],
        ["doc_id", "lang", "n_chars"],
    ).write.parquet(src)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "healthcare_api_spark.cli", "search",
         "--parquet", src, "--type", "Doc", "--id-col", "doc_id",
         "--param", "lang=es", "--param", "_sort=-n_chars",
         "--output", out],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    rows = []
    for f in glob.glob(f"{out}/part-*"):
        with open(f) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert [x["doc_id"] for x in rows] == [3, 1]


def test_repeated_param_and_closed_range(engine):
    # ?date=ge2024-01-15&date=le2024-02-15 — both must hold (FHIR
    # repetition = AND; the only way to express a closed range)
    rows = engine.search(
        "Observation", {"date": ["ge2024-01-15", "le2024-02-15"]}
    ).collect()
    assert [r["id"] for r in rows] == ["o2"]
    # single occurrence stays a half-open range
    lo = engine.search("Observation", {"date": "ge2024-01-15"}).count()
    assert lo == 2


def test_repeated_param_composes_with_or_lists(engine):
    # first occurrence ORs two names, second ANDs name=smith
    rows = engine.search(
        "Patient", {"name": ["everywoman,smith", "smith"]}
    ).collect()
    assert sorted(r["id"] for r in rows) == ["p2", "p3"]


@pytest.fixture(scope="module")
def text_engine(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data spark streaming engine wins"),
            (2, "spark engine streaming out of order"),
            (3, "streaming spark data"),
            (4, "spark streaming at the end spark streaming"),
        ],
        ["doc_id", "text"],
    )
    return SearchEngine(
        {"Doc": docs},
        {"Doc": SearchConfig(text_search_col="text", id_col="doc_id")},
    )


def test_text_quoted_phrase_requires_adjacency(text_engine):
    got = {
        r["doc_id"]
        for r in text_engine.search("Doc", {"_text": '"spark streaming"'}).collect()
    }
    assert got == {1, 4}  # doc 2 has both words, wrong order


def test_text_phrase_composes_with_bare_terms(text_engine):
    got = {
        r["doc_id"]
        for r in text_engine.search(
            "Doc", {"_text": '"spark streaming" wins'}
        ).collect()
    }
    assert got == {1}


def test_text_phrase_longer_than_doc_matches_nothing(text_engine):
    assert (
        text_engine.search(
            "Doc", {"_text": '"streaming spark data plus more words than the doc has"'}
        ).count()
        == 0
    )


def test_text_bm25_ranking_list_valued_sort(spark):
    # ADVICE r5: {"_sort": ["-_score,doc_id"]} (the repeated-param list
    # form) must attach the BM25 score exactly like the string form —
    # previously the substring check read the raw list and never
    # attached _score while the sort handler still sorted by it.
    from healthcare_api_spark.plans.search import SearchConfig, SearchEngine

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pie"),
            (2, "apple and a very long tail of many other words here now"),
            (3, "apple pie"),
            (4, "no match at all"),
        ],
        ["doc_id", "text"],
    )
    eng = SearchEngine(
        tables={"Doc": docs},
        configs={"Doc": SearchConfig(id_col="doc_id", text_search_col="text")},
    )
    out = eng.search(
        "Doc", {"_text": "apple", "_sort": ["-_score,doc_id"], "_count": "10"}
    ).collect()
    assert [r["doc_id"] for r in out][0] == 1
    scores = [r["_score"] for r in out]
    assert scores == sorted(scores, reverse=True) and all(s > 0 for s in scores)


def test_quantity_param_full_grammar(spark):
    """FHIR quantity search (r11): comparator on value, exact token
    match on system/code; bare number = equality; ``v||code`` matches
    the unit under ANY system; comma = OR; repetition = AND."""
    obs = spark.createDataFrame(
        [
            ("o1", 5.4, "http://unitsofmeasure.org", "mg"),
            ("o2", 5.4, "http://example.org/units", "mg"),
            ("o3", 9.9, "http://unitsofmeasure.org", "mg"),
            ("o4", 5.4, "http://unitsofmeasure.org", "mL"),
        ],
        "id string, q_value double, q_system string, q_code string",
    )
    eng = SearchEngine(
        {"Observation": obs},
        {
            "Observation": SearchConfig(
                quantity_params={
                    "value-quantity": ("q_value", "q_system", "q_code")
                }
            )
        },
    )

    def ids(params):
        return sorted(
            r["id"] for r in eng.search("Observation", params).collect()
        )

    # comparator + system + code
    assert ids(
        {"value-quantity": "gt5|http://unitsofmeasure.org|mg"}
    ) == ["o1", "o3"]
    # bare number = typed equality, any system/unit
    assert ids({"value-quantity": "5.4"}) == ["o1", "o2", "o4"]
    # code-only leg: any system
    assert ids({"value-quantity": "5.4||mg"}) == ["o1", "o2"]
    # comma OR + repeated-param AND (closed range on one leg)
    assert ids(
        {"value-quantity": ["ge5||mg,le6||mL", "lt9"]}
    ) == ["o1", "o2", "o4"]


def test_quantity_param_unit_mismatch_empty(spark):
    """Unit mismatch excludes rows that satisfy the numeric leg: mg
    rows never match a kg-coded search, and a wrong system with the
    right code excludes too (VERDICT r10 #7's required test)."""
    obs = spark.createDataFrame(
        [("o1", 5.4, "http://unitsofmeasure.org", "mg")],
        "id string, q_value double, q_system string, q_code string",
    )
    eng = SearchEngine(
        {"Observation": obs},
        {
            "Observation": SearchConfig(
                quantity_params={
                    "value-quantity": ("q_value", "q_system", "q_code")
                }
            )
        },
    )
    assert eng.search(
        "Observation", {"value-quantity": "gt0|http://unitsofmeasure.org|kg"}
    ).count() == 0
    assert eng.search(
        "Observation", {"value-quantity": "gt0|http://example.org/units|mg"}
    ).count() == 0
    # sanity: the matching triple DOES return the row
    assert eng.search(
        "Observation", {"value-quantity": "gt0|http://unitsofmeasure.org|mg"}
    ).count() == 1


def test_composite_param_same_element_semantics(spark):
    """FHIR composite: components must match inside the SAME repeating
    element — o2 has code 8480-6 (value 70) and code 8462-4 (value 95),
    so `8480-6$gt90` must NOT match it even though it has both a
    8480-6 component and a >90 value; o1 (8480-6 at 120) matches."""
    obs = spark.createDataFrame(
        [
            ("o1", [{"code": "8480-6", "v": 120.0}]),
            ("o2", [{"code": "8480-6", "v": 70.0},
                    {"code": "8462-4", "v": 95.0}]),
            ("o3", None),
        ],
        "id string, components array<struct<code:string,v:double>>",
    )
    eng = SearchEngine(
        {"Observation": obs},
        {
            "Observation": SearchConfig(
                composite_params={
                    "component-code-value": (
                        "components",
                        [("code", "token"), ("v", "number")],
                    )
                }
            )
        },
    )

    def ids(params):
        return sorted(
            r["id"] for r in eng.search("Observation", params).collect()
        )

    assert ids({"component-code-value": "8480-6$gt90"}) == ["o1"]
    # bare number component = equality; comma = OR of whole composites
    assert ids(
        {"component-code-value": "8480-6$70,8462-4$gt90"}
    ) == ["o2"]
    # repetition = AND (both composites must hold, each in ITS element)
    assert ids(
        {"component-code-value": ["8480-6$70", "8462-4$ge95"]}
    ) == ["o2"]
    import pytest

    with pytest.raises(ValueError, match="components"):
        eng.search("Observation", {"component-code-value": "8480-6"})


def test_uri_param_grammar(spark):
    """uri-class search (r12): exact by default (case-sensitive, no
    prefix), :below = query-is-prefix, :above = stored-is-prefix,
    comma = OR, :missing and :not compose via the generic branches."""
    res = spark.createDataFrame(
        [
            ("r1", "http://example.org/vs/a"),
            ("r2", "http://example.org/vs/a/b"),
            ("r3", "http://example.org/vs/c"),
            ("r4", None),
        ],
        "id string, url string",
    )
    eng = SearchEngine(
        {"ValueSet": res},
        {
            "ValueSet": SearchConfig(
                params={"url": "url"}, uri_params={"url"}
            )
        },
    )

    def ids(params):
        return sorted(
            r["id"] for r in eng.search("ValueSet", params).collect()
        )

    # exact — no implicit prefix, no case folding
    assert ids({"url": "http://example.org/vs/a"}) == ["r1"]
    assert ids({"url": "HTTP://example.org/vs/a"}) == []
    # :below — stored uris the query is a prefix of
    assert ids({"url:below": "http://example.org/vs/a"}) == ["r1", "r2"]
    # :above — stored uris that are a prefix of the query
    assert ids(
        {"url:above": "http://example.org/vs/a/b/c"}
    ) == ["r1", "r2"]
    # comma OR
    assert ids(
        {"url": "http://example.org/vs/a,http://example.org/vs/c"}
    ) == ["r1", "r3"]
    # :missing and :not keep their generic semantics
    assert ids({"url:missing": "true"}) == ["r4"]
    assert ids({"url:not": "http://example.org/vs/a"}) == [
        "r2", "r3", "r4"
    ]


def test_token_subsumption_grammar(spark):
    """token :below/:above (r12): the closure dimension widens the
    match to the subtree/ancestry; bare (system-less) codes match any
    system; a missing closure raises."""
    import pytest as _pytest

    obs = spark.createDataFrame(
        [
            ("o1", [("http://cs", "click")]),
            ("o2", [("http://cs", "view")]),
            ("o3", [("http://cs", "interaction")]),
            ("o4", [("http://other", "click")]),
            ("o5", [("http://cs", "purchase")]),
        ],
        "id string, codings array<struct<system string, code string>>",
    )
    closure = spark.createDataFrame(
        [
            ("http://cs", "interaction", "click"),
            ("http://cs", "interaction", "view"),
            ("http://cs", "lifecycle", "purchase"),
        ],
        "system string, ancestor string, descendant string",
    )
    eng = SearchEngine(
        {"Observation": obs},
        {
            "Observation": SearchConfig(
                token_params={"code": "codings"}, code_closure=closure
            )
        },
    )

    def ids(params):
        return sorted(
            r["id"] for r in eng.search("Observation", params).collect()
        )

    # :below — the code itself plus its descendants, system-pinned
    assert ids({"code:below": "http://cs|interaction"}) == [
        "o1", "o2", "o3"
    ]
    # :above — the code itself plus its ancestors
    assert ids({"code:above": "http://cs|click"}) == ["o1", "o3"]
    # bare code: any system (o4's other-system click also matches)
    assert ids({"code:below": "interaction"}) == ["o1", "o2", "o3", "o4"]
    # plain token search unchanged
    assert ids({"code": "http://cs|click"}) == ["o1"]
    # no closure configured -> explicit error
    eng2 = SearchEngine(
        {"Observation": obs},
        {"Observation": SearchConfig(token_params={"code": "codings"})},
    )
    with _pytest.raises(ValueError, match="code_closure"):
        eng2.search("Observation", {"code:below": "http://cs|click"})


def test_summary_result_shaping(spark):
    """_summary (r12): count = count-only, true = the configured
    summary projection, data = full row minus the narrative column,
    false = full row; unknown values and unconfigured true raise."""
    import pytest as _pytest

    res = spark.createDataFrame(
        [("p1", "Eve", 44, "<div>narrative</div>")],
        "id string, name string, age int, text string",
    )
    cfg = SearchConfig(
        params={"name": "name"},
        summary_elements=["id", "name"],
        narrative_col="text",
    )
    eng = SearchEngine({"Patient": res}, {"Patient": cfg})
    assert eng.search("Patient", {"_summary": "count"}).collect()[0][
        "total"
    ] == 1
    assert eng.search("Patient", {"_summary": "true"}).columns == [
        "id", "name"
    ]
    assert eng.search("Patient", {"_summary": "data"}).columns == [
        "id", "name", "age"
    ]
    assert eng.search("Patient", {"_summary": "false"}).columns == [
        "id", "name", "age", "text"
    ]
    with _pytest.raises(ValueError, match="unsupported _summary"):
        eng.search("Patient", {"_summary": "bogus"})
    bare = SearchEngine({"Patient": res}, {"Patient": SearchConfig()})
    with _pytest.raises(ValueError, match="summary_elements"):
        bare.search("Patient", {"_summary": "true"})


def test_token_valueset_membership_grammar(spark):
    """token :in/:not-in (r12): ValueSet membership via the configured
    (url, system, code) expansion; :not-in is null-safe (rows with no
    codings match); missing config raises."""
    import pytest as _pytest

    obs = spark.createDataFrame(
        [
            ("o1", [("http://cs", "click")]),
            ("o2", [("http://cs", "view")]),
            ("o3", [("http://other", "click")]),
            ("o4", [("http://cs", "purchase")]),
        ],
        "id string, codings array<struct<system string, code string>>",
    )
    vs = spark.createDataFrame(
        [
            ("http://example.org/vs/engagement", "http://cs", "click"),
            ("http://example.org/vs/engagement", "http://cs", "view"),
            ("http://example.org/vs/commerce", "http://cs", "purchase"),
        ],
        "url string, system string, code string",
    )
    eng = SearchEngine(
        {"Observation": obs},
        {
            "Observation": SearchConfig(
                token_params={"code": "codings"}, value_sets=vs
            )
        },
    )

    def ids(params):
        return sorted(
            r["id"] for r in eng.search("Observation", params).collect()
        )

    # membership is (system, code)-exact: o3's other-system click is out
    assert ids({"code:in": "http://example.org/vs/engagement"}) == [
        "o1", "o2"
    ]
    # comma = OR of ValueSets
    assert ids(
        {"code:in": "http://example.org/vs/engagement,"
                    "http://example.org/vs/commerce"}
    ) == ["o1", "o2", "o4"]
    # :not-in — complement, null-safe
    assert ids({"code:not-in": "http://example.org/vs/engagement"}) == [
        "o3", "o4"
    ]
    eng2 = SearchEngine(
        {"Observation": obs},
        {"Observation": SearchConfig(token_params={"code": "codings"})},
    )
    with _pytest.raises(ValueError, match="value_sets"):
        eng2.search("Observation", {"code:in": "http://x"})
