"""FHIR-search-parameter → DataFrame translator (SURVEY.md §2.7).

The reference delegates its entire read path to Google's hosted FHIR
search (README.md:97-105). This module is the native replacement: a
*frontend* that parses the search-parameter grammar and emits a
declarative DataFrame plan — filters become Column predicates (pushed
into scans by Catalyst), chained parameters become joins, ``_include`` /
``_revinclude`` become left joins along reference keys, ``_has`` becomes
a semi-join. No custom execution: Catalyst owns the physical plan.

Supported grammar (each an entry in §2.7's capability table):

    field=value                token / string-class match (comma = OR)
    field=eqV|neV|gtV|ltV|geV|leV   prefixed comparators (number/date)
    field:exact=value          exact string match
    field:contains=value       substring
    field:not=value            negation incl. absent values
    field:missing=true|false   presence filter
    code=system|code / |code / code   token search over coding arrays
    code:below=X / code:above=X token subsumption via the configured
                               (system, ancestor, descendant) closure
    code:in=url / code:not-in=url   ValueSet membership via the
                               configured (url, system, code) expansion
    uri=value / uri:below / uri:above   uri-class match (exact /
                               query-is-prefix / stored-is-prefix)
    field=Type/id              reference filter
    ref_field.sub=value        chained search (join target table)
    _has:Type:ref:field=value  reverse chain (semi-join); the field part
                               is itself a full search on Type, so
                               modifiers, chained sub-params
                               (_has:Obs:patient:subject.name=v) and
                               nested _has all compose
    _include=Type:ref          include referenced rows (left join)
    _include:iterate=Type:ref  transitive includes over already-included
                               resources (depth-capped)
    _revinclude=Type:ref       include referencing rows
    _sort=[-]field             sort; chained keys (_sort=subject.name)
                               left-join the referenced field in
    _count=N / _page_token=v   paging (keyset off the sort key)
    _elements=a,b              projection
    _summary=count|true|data|false   result shaping (count-only /
                               configured summary view / strip
                               narrative / full)
    _total=accurate            count only
    _filter=expr               boolean expression grammar: and/or/not,
                               parens, eq ne gt lt ge le co sw ew pr
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_api_spark.functions.refs import ref_id

# Opaque page-token encoding: one value per sort key (incl. the id
# tie-break), joined on the ASCII unit separator — a byte that cannot
# appear in FHIR ids/dates/numbers. NULL sort values get their own
# sentinel byte (NOT ""): "" would be cast to a typed NULL by
# _typed_lit for numeric/date keys, making the whole composite bound
# NULL and silently filtering every row — pages after a NULL-keyed row
# would come back empty. NULLs are reachable via chained sort keys
# (dangling references sort NULLs-first).
PAGE_TOKEN_SEP = "\x1f"
PAGE_TOKEN_NULL = "\x00"


def encode_page_token(*values) -> str:
    """Build a ``_page_token`` from the final row of a page: one value
    per effective sort key, in `_sort` order WITH the id tie-break last
    (the engine appends the configured ``id_col`` to `_sort` whenever a
    page token is used, so a token always carries it). ``None`` values
    are encoded as the NULL sentinel and paged through null-aware
    bounds — no rows are lost around NULL-keyed blocks."""
    return PAGE_TOKEN_SEP.join(
        PAGE_TOKEN_NULL if v is None else str(v) for v in values
    )


_PREFIX_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "lt": lambda c, v: c < v,
    "ge": lambda c, v: c >= v,
    "le": lambda c, v: c <= v,
}


@dataclass
class SearchConfig:
    """Per-resource search-parameter metadata.

    ``params`` maps a search-param name to the column expression path;
    ``reference_params`` maps a param name to (column path, target type)
    for chaining/includes; ``token_params`` maps a param name to the
    CodeableConcept-style coding array path for ``system|code`` matching.
    """

    params: dict[str, str] = field(default_factory=dict)
    reference_params: dict[str, tuple[str, str]] = field(default_factory=dict)
    token_params: dict[str, str] = field(default_factory=dict)
    # param → (array column, struct field): FHIR HumanName-style search,
    # `?name=eve` ≡ exists(name, n -> lower(n.family).startswith('eve'))
    array_string_params: dict[str, tuple[str, str]] = field(default_factory=dict)
    # params with FHIR class 'string': case-insensitive prefix match
    # regardless of the query value's case (`?name=Eve` ≡ `?name=eve`).
    # Params not listed here get token semantics (exact equality).
    string_params: set[str] = field(default_factory=set)
    # array_string_params listed here are TOKEN-class instead (exact
    # equality on the struct field — identifiers, not names). Unlisted
    # array params keep string semantics, the right default for the
    # HumanName shape this registry exists for.
    token_class_params: set[str] = field(default_factory=set)
    # param → (value column, system column, code/unit column): FHIR
    # 'quantity'-class search (r11, VERDICT r10 #7) — the one search
    # param class §2.7 lacked. Grammar per FHIR R4:
    # ``value-quantity=[prefix]number[|system[|code]]`` — comparator
    # prefixes apply to the value column; a non-empty system/code leg
    # must ALSO match exactly (token semantics). ``5.4||mg`` matches
    # unit 'mg' under ANY system.
    quantity_params: dict[str, tuple[str, str, str]] = field(
        default_factory=dict
    )
    # param → (array column, [(element field, class), ...]) with class
    # ∈ {"token", "number"}: FHIR 'composite'-class search (r11) —
    # ``component-code-value=8480-6$gt90`` requires ALL components to
    # match inside the SAME repeating element (one F.exists over the
    # array, never a cross-element AND that would false-positive on
    # two different components). Number components take the comparator
    # prefixes; token components match exactly. Comma = OR of whole
    # composite values; repetition = AND.
    composite_params: dict[str, tuple[str, list[tuple[str, str]]]] = field(
        default_factory=dict
    )
    # params with FHIR class 'uri' (r12, VERDICT r11 #5): exact match
    # by default (case-sensitive, never the string-class prefix);
    # ``:below`` matches any stored uri the query value is a prefix of
    # (http://hl7.org/fhir/search.html#uri), ``:above`` the reverse
    # (the stored uri is a prefix of the query value).
    uri_params: set[str] = field(default_factory=set)
    # (system, ancestor, descendant) subsumption closure for token
    # ``:above``/``:below`` (r12) — code-system hierarchy, transitive
    # (reflexive rows optional: the query code always matches itself).
    # The per-query subtree is collected ONCE at plan build into a
    # literal IN list (bounded by the code system's subtree size — the
    # MIME-lookup discipline: a tiny dimension, never a corpus join).
    code_closure: "DataFrame | None" = None
    # (url, system, code) ValueSet expansion dimension for token
    # ``:in``/``:not-in`` (r12) — ``code:in=<valueset-url>`` matches
    # any member coding; same bounded plan-build collect as the
    # closure.
    value_sets: "DataFrame | None" = None
    # column for `_text=` full-text search (AND of whitespace terms,
    # token-level membership). None = _text unsupported for the type.
    text_search_col: str | None = None
    # `_summary=true` projection (r12): the columns that make up the
    # type's summary view (FHIR marks summary elements per resource;
    # here it is catalog config). None = _summary=true unsupported.
    summary_elements: "list[str] | None" = None
    # the narrative/text column `_summary=data` strips. None = data
    # form is the full row (nothing to strip).
    narrative_col: str | None = None
    # unique row-id column, used as the deterministic tie-break that
    # keyset pagination appends to `_sort` (FHIR resources: "id")
    id_col: str = "id"


def _typed_lit(df: DataFrame, colpath: str, value: str):
    """Cast the string search value to the column's type so comparisons
    are typed (dates/numbers) and predicate pushdown stays eligible."""
    dtype = df.select(F.col(colpath)).schema[0].dataType.simpleString()
    c = F.lit(value)
    if dtype in ("int", "bigint", "smallint", "tinyint"):
        return c.cast("bigint")
    if dtype in ("double", "float"):
        return c.cast("double")
    if dtype == "timestamp":
        return c.cast("timestamp")
    if dtype == "date":
        return c.cast("date")
    return c


_PREFIXABLE_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float",
                     "decimal", "timestamp", "date", "timestamp_ntz")


def _apply_simple(
    df: DataFrame, colpath: str, raw: str, modifier: str | None, *, string_class: bool = False
) -> Column:
    """One (param, value) → predicate. Comma in value = OR (FHIR 'or').

    Comparator prefixes (ge/le/…) apply to number/date/quantity columns
    per the FHIR grammar, and to string columns only when the remainder
    is digit-leading (ISO dates / numbers kept as strings) — otherwise
    string values that happen to start with 'ge'/'ne'/'le' ("george",
    "neuro", "lesion") would be silently misparsed as comparisons.

    ``string_class`` carries the *configured* FHIR param class: string
    params get case-insensitive prefix match regardless of the query
    value's capitalization (`?name=Eve` ≡ `?name=eve`); everything else
    is token semantics (typed equality).
    """
    dtype0 = df.select(F.col(colpath)).schema[0].dataType.simpleString()
    typed_prefixable = any(dtype0.startswith(t) for t in _PREFIXABLE_TYPES)
    ors = []
    for value in raw.split(","):
        prefix = value[:2]
        prefixable = typed_prefixable or (len(value) > 2 and value[2].isdigit())
        if prefixable and prefix in _PREFIX_OPS and len(value) > 2:
            ors.append(_PREFIX_OPS[prefix](F.col(colpath), _typed_lit(df, colpath, value[2:])))
        elif modifier == "contains":
            ors.append(F.lower(F.col(colpath)).contains(value.lower()))
        elif modifier == "exact":
            ors.append(F.col(colpath) == F.lit(value))
        elif string_class:
            ors.append(F.lower(F.col(colpath)).startswith(value.lower()))
        else:
            ors.append(F.col(colpath) == _typed_lit(df, colpath, value))
    out = ors[0]
    for o in ors[1:]:
        out = out | o
    return out


def _parse_text_query(raw: str) -> list[list[str]]:
    """Split a ``_text`` value into match units: a double-quoted group
    is one phrase unit (list of its lowercased words, matched as
    adjacent tokens); everything else contributes single-word units.
    ``spark "structured streaming" engine`` →
    ``[["spark"], ["structured", "streaming"], ["engine"]]``."""
    units: list[list[str]] = []
    for i, seg in enumerate(raw.split('"')):
        words = seg.lower().split()
        if i % 2 == 1:  # inside quotes
            if words:
                units.append(words)
        else:
            units.extend([w] for w in words)
    return units


def _phrase_pred(toks: Column, phrase: list[str]) -> Column:
    """Exact-phrase predicate over a token array: true when the phrase
    occurs as ADJACENT tokens in order. Narrow expression — an exists
    over candidate start offsets with per-offset equality of the next
    ``len(phrase)`` tokens. ``F.get`` (not element_at) so out-of-range
    probes yield NULL instead of an ANSI error."""

    def _at_offset(i: Column) -> Column:
        pred = None
        for j, term in enumerate(phrase):
            eq = F.get(toks, i + F.lit(j)) == F.lit(term)
            pred = eq if pred is None else (pred & eq)
        return pred

    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - F.lit(len(phrase)), F.lit(0))
    )
    return F.exists(starts, _at_offset)


def _tokenize_filter(s: str) -> list[tuple[str, str]]:
    """Lex a ``_filter`` expression: parens, double-quoted strings
    (backslash escapes), bare words. Returns (kind, text) pairs with
    kind ∈ {'(', ')', 'str', 'word'}."""
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "()":
            toks.append((c, c))
            i += 1
        elif c == '"':
            j, buf = i + 1, []
            while j < len(s) and s[j] != '"':
                if s[j] == "\\" and j + 1 < len(s):
                    j += 1
                buf.append(s[j])
                j += 1
            if j >= len(s):
                raise ValueError("_filter: unterminated quoted string")
            toks.append(("str", "".join(buf)))
            i = j + 1
        else:
            j = i
            while j < len(s) and not s[j].isspace() and s[j] not in '()"':
                j += 1
            toks.append(("word", s[i:j]))
            i = j
    return toks


class _FilterParser:
    """Recursive-descent parser for the FHIR ``_filter`` grammar
    (http://hl7.org/fhir/search_filter.html — public spec):

        filter   = paramExp | logExp | "not" "(" filter ")" | "(" filter ")"
        logExp   = filter ("and" | "or") filter       (and binds tighter)
        paramExp = paramPath compareOp compValue

    Supported compareOps: eq ne gt lt ge le co (contains) sw
    (starts-with) ew (ends-with) pr (property present). ``make_pred``
    maps (param, op, value) → Column, so the parser stays independent
    of the catalog."""

    def __init__(self, toks: list[tuple[str, str]], make_pred):
        self.toks = toks
        self.pos = 0
        self.make_pred = make_pred

    def _peek_word(self) -> str | None:
        if self.pos < len(self.toks) and self.toks[self.pos][0] == "word":
            return self.toks[self.pos][1]
        return None

    def _expect(self, kind: str) -> None:
        if self.pos >= len(self.toks) or self.toks[self.pos][0] != kind:
            raise ValueError(f"_filter: expected '{kind}' at token {self.pos}")
        self.pos += 1

    def parse(self) -> Column:
        e = self._or_expr()
        if self.pos != len(self.toks):
            raise ValueError(
                f"_filter: trailing tokens from {self.toks[self.pos:]}"
            )
        return e

    def _or_expr(self) -> Column:
        left = self._and_expr()
        while self._peek_word() == "or":
            self.pos += 1
            left = left | self._and_expr()
        return left

    def _and_expr(self) -> Column:
        left = self._unary()
        while self._peek_word() == "and":
            self.pos += 1
            left = left & self._unary()
        return left

    def _unary(self) -> Column:
        if self._peek_word() == "not":
            self.pos += 1
            self._expect("(")
            e = self._or_expr()
            self._expect(")")
            # FHIR not(): rows where the inner test is NOT satisfied —
            # including rows where the field is absent (null-safe, like
            # the :not modifier; a bare ~ would 3VL-drop nulls)
            return ~F.coalesce(e, F.lit(False))
        if self.pos < len(self.toks) and self.toks[self.pos][0] == "(":
            self.pos += 1
            e = self._or_expr()
            self._expect(")")
            return e
        return self._param_exp()

    def _param_exp(self) -> Column:
        if self._peek_word() is None:
            raise ValueError("_filter: expected a parameter expression")
        name = self.toks[self.pos][1]
        self.pos += 1
        op = self._peek_word()
        if op is None:
            raise ValueError(f"_filter: missing operator after '{name}'")
        self.pos += 1
        if self.pos >= len(self.toks) or self.toks[self.pos][0] not in ("word", "str"):
            raise ValueError(f"_filter: missing value for '{name} {op}'")
        value = self.toks[self.pos][1]
        self.pos += 1
        return self.make_pred(name, op, value)


class SearchEngine:
    """Executes FHIR-search-style queries over a catalog of DataFrames."""

    def __init__(self, tables: dict[str, DataFrame], configs: dict[str, SearchConfig]):
        self.tables = tables
        self.configs = configs

    @classmethod
    def from_store(cls, store, type_configs: dict[str, "SearchConfig"]) -> "SearchEngine":
        """Bind the engine to a ResourceStore: one table per configured
        resource type (partition-pruned scans)."""
        return cls({t: store.table(t) for t in type_configs}, type_configs)

    def _resolve(self, rtype: str, name: str) -> str:
        cfg = self.configs.get(rtype, SearchConfig())
        return cfg.params.get(name, name)

    def _check_column(self, df: DataFrame, rtype: str, param: str, colpath: str) -> None:
        try:
            df.select(F.col(colpath))
        except Exception as e:
            raise ValueError(
                f"unknown search parameter '{param}' for {rtype}: no column "
                f"'{colpath}' (configure it in SearchConfig.params)"
            ) from e

    def _filter_pred(self, df: DataFrame, rtype: str, expr: str) -> Column:
        """``_filter`` grammar → one Column predicate (README.md:105's
        advanced-search envelope). Everything stays a pure expression —
        pushdown-eligible, no joins — so arbitrarily nested and/or/not
        combinations over token + range params cost the same scan as a
        plain filter."""
        cfg = self.configs.get(rtype, SearchConfig())

        def make_pred(name: str, op: str, value: str) -> Column:
            colpath = self._resolve(rtype, name)
            self._check_column(df, rtype, name, colpath)
            c = F.col(colpath)
            if op == "pr":  # property present
                return c.isNotNull() if value == "true" else c.isNull()
            if op in _PREFIX_OPS:
                return _PREFIX_OPS[op](c, _typed_lit(df, colpath, value))
            if op == "co":
                return F.lower(c).contains(value.lower())
            if op == "sw":
                return F.lower(c).startswith(value.lower())
            if op == "ew":
                return F.lower(c).endswith(value.lower())
            raise ValueError(f"_filter: unsupported operator '{op}'")

        # string-class params keep FHIR string semantics under eq: the
        # spec maps `name eq "eve"` to the same match as `?name=eve`
        def make_pred_stringaware(name: str, op: str, value: str) -> Column:
            if op == "eq" and name in cfg.string_params:
                colpath = self._resolve(rtype, name)
                self._check_column(df, rtype, name, colpath)
                return F.lower(F.col(colpath)).startswith(value.lower())
            return make_pred(name, op, value)

        return _FilterParser(_tokenize_filter(expr), make_pred_stringaware).parse()

    def search(self, resource_type: str, params: dict[str, str]) -> DataFrame:
        """Translate ``params`` into a DataFrame plan over the catalog."""
        df = self.tables[resource_type]
        cfg = self.configs.get(resource_type, SearchConfig())
        # (column path, descending) — kept as data, not Columns, so
        # _page_token can derive its keyset predicate from the sort key
        sort_fields: list[tuple[str, bool]] = []
        count: int | None = None
        elements: list[str] | None = None
        total_only = False
        page_token: str | None = None
        includes: list[str] = []
        revincludes: list[tuple[str, str]] = []
        iterate_specs: list[tuple[str, str]] = []
        # `_sort_N` columns joined in for chained sort keys — dropped
        # from the result unless the query pages (tokens need the values)
        chained_sort_cols: list[str] = []

        # FHIR repeated-parameter AND semantics: a query string may
        # repeat a param (`?date=ge2020-01-01&date=le2020-12-31`) and
        # every occurrence must hold (comma inside ONE value is OR;
        # repetition is AND — the only way to express a closed range).
        # dicts can't repeat keys, so a list value is the repetition:
        # {"date": ["ge2020-01-01", "le2020-12-31"]}. Each occurrence
        # contributes its own filter, so modifiers/chains/_has compose
        # unchanged; for control params (_sort, _elements, …) repeats
        # apply in order (last-wins where the param is single-valued).
        expanded: list[tuple[str, str]] = []
        for key, val in params.items():
            if isinstance(val, (list, tuple)):
                expanded.extend((key, v) for v in val)
            else:
                expanded.append((key, val))
        for key, raw in expanded:
            name, _, modifier = key.partition(":")
            if key == "_total":
                total_only = raw == "accurate"
            elif key == "_count":
                count = int(raw)
            elif key == "_page_token":
                page_token = raw
            elif key == "_filter":
                df = df.filter(self._filter_pred(df, resource_type, raw))
            elif key == "_text":
                # full-text: every whitespace-separated term must appear
                # as a token of the configured text column (AND), and a
                # double-quoted group must appear as an EXACT PHRASE
                # (adjacent tokens, in order). The scan-based predicates
                # are narrow; for repeated queries at scale, build the
                # inverted index (textops.positional_index) instead.
                if cfg.text_search_col is None:
                    raise ValueError(
                        f"_text is not configured for {resource_type}"
                        " (set SearchConfig.text_search_col)"
                    )
                from healthcare_api_spark.functions.text import tokens

                units = _parse_text_query(raw)
                # _sort may arrive list-valued ({"_sort": ["_score,-date"]},
                # the repeated-param form); normalize before the substring
                # check or the BM25 score is never attached while the sort
                # handler still sorts by _score (ADVICE r5).
                _sort_raw = params.get("_sort") or ""
                if not isinstance(_sort_raw, str):
                    _sort_raw = ",".join(_sort_raw)
                if "_score" in _sort_raw:
                    # ranked full-text: attach the BM25 relevance BEFORE
                    # the AND filters. Stats (df_t, N, avgdl) come from
                    # the FULL table — relevance is corpus-relative, not
                    # filtered-subset-relative. Phrase terms score as
                    # their individual words (phrase is a filter, not a
                    # scoring unit).
                    from healthcare_api_spark.operators.textops import (
                        bm25_score_col,
                    )

                    df = bm25_score_col(
                        df, self.tables[resource_type],
                        cfg.text_search_col, [w for u in units for w in u],
                    )
                toks = tokens(F.col(cfg.text_search_col))
                for unit in units:
                    if len(unit) == 1:
                        df = df.filter(F.array_contains(toks, unit[0]))
                    else:
                        df = df.filter(_phrase_pred(toks, unit))
            elif key == "_include":
                # _include=SourceType:refParam — source must be the
                # searched type (FHIR R4 form)
                for spec in raw.split(","):
                    src_t, _, rp = spec.partition(":")
                    if src_t != resource_type:
                        raise ValueError(
                            f"_include source '{src_t}' must be the searched "
                            f"type '{resource_type}'"
                        )
                    includes.append(rp)
            elif key == "_include:iterate":
                # transitive include (FHIR R4): Type:ref applies to any
                # ALREADY-INCLUDED resource of that type, repeatedly,
                # depth-capped — each hop is one more 1:1 left join on
                # the returned page only
                for spec in raw.split(","):
                    src_t, _, rp = spec.partition(":")
                    iterate_specs.append((src_t, rp))
            elif key == "_revinclude":
                for spec in raw.split(","):
                    src_t, _, rp = spec.partition(":")
                    revincludes.append((src_t, rp))
            elif key == "_sort":
                for s in raw.split(","):
                    sname, desc = s.lstrip("-"), s.startswith("-")
                    if sname == "_score":
                        # BM25 relevance rank (attached by the _text
                        # branch; existence checked at sort time)
                        sort_fields.append(("_score", desc))
                    elif (
                        "." in sname
                        and sname.split(".", 1)[0] in cfg.reference_params
                    ):
                        # chained sort key (`_sort=subject.name`): left-join
                        # the referenced resource's field in as a
                        # `_sort_N` column and sort on that. Same
                        # no-forced-broadcast scale rule as chained
                        # filters; rows with a dangling reference sort
                        # with NULL (first asc, per Spark defaults).
                        ref_param, sub = sname.split(".", 1)
                        ref_col, target_type = cfg.reference_params[ref_param]
                        t_cfg = self.configs.get(target_type, SearchConfig())
                        target = self.tables[target_type]
                        alias = f"_sort_{len(sort_fields)}"
                        keymap = target.select(
                            F.col(t_cfg.id_col).alias("_sk"),
                            F.col(t_cfg.params.get(sub, sub)).alias(alias),
                        )
                        df = df.join(
                            keymap, ref_id(F.col(ref_col)) == F.col("_sk"), "left"
                        ).drop("_sk")
                        sort_fields.append((alias, desc))
                        chained_sort_cols.append(alias)
                    else:
                        sort_fields.append((self._resolve(resource_type, sname), desc))
            elif key == "_elements":
                elements = [self._resolve(resource_type, e) for e in raw.split(",")]
            elif key == "_summary":
                # result shaping (r12 — the last delegated-surface
                # shaping param): count = count-only (the _total
                # device); true = the configured summary projection;
                # data = full row minus the narrative column; false =
                # full row. All forms are pure projections — column
                # pruning reaches the scan like _elements.
                if raw == "count":
                    total_only = True
                elif raw == "true":
                    if cfg.summary_elements is None:
                        raise ValueError(
                            f"_summary=true is not configured for "
                            f"{resource_type} (set "
                            "SearchConfig.summary_elements)"
                        )
                    elements = list(cfg.summary_elements)
                elif raw == "data":
                    if cfg.narrative_col is not None:
                        elements = [
                            c
                            for c in df.columns
                            if c != cfg.narrative_col
                        ]
                elif raw != "false":
                    raise ValueError(
                        f"unsupported _summary value '{raw}' "
                        "(count|true|data|false)"
                    )
            elif key.startswith("_has:"):
                # _has:Observation:patient:code=X → semi-join from Observation.
                # The remainder after `_has:Type:ref:` is ITSELF a search on
                # the source type, evaluated by recursion — so modifiers
                # (`:exact`), token params, chained sub-params
                # (`_has:Obs:patient:subject.name=eve`) and nested _has
                # (`_has:Enc:subject:_has:Obs:encounter:code=x`) all work
                # with exactly the semantics they have as top-level params.
                _, src_type, ref_param, src_key = key.split(":", 3)
                src_cfg = self.configs.get(src_type, SearchConfig())
                ref_col, _target = src_cfg.reference_params[ref_param]
                filtered = self.search(src_type, {src_key: raw})
                # Semi-join on the filtered source's reference keys. No
                # broadcast hint and no pre-distinct: left_semi already
                # dedups matches, and the key set is unbounded (a loose
                # filter at 100 TB can match millions of rows — a forced
                # broadcast would OOM the driver). AQE converts to BHJ at
                # runtime when the filtered side is actually small.
                keys = filtered.select(ref_id(F.col(ref_col)).alias("_k"))
                df = df.join(keys, df[cfg.id_col] == F.col("_k"), "left_semi")
            elif "." in name and name.split(".", 1)[0] in cfg.reference_params:
                # chained search: subject.name=X → join target table
                ref_param, sub = name.split(".", 1)
                ref_col, target_type = cfg.reference_params[ref_param]
                target = self.tables[target_type]
                t_cfg = self.configs.get(target_type, SearchConfig())
                pred = _apply_simple(
                    target, t_cfg.params.get(sub, sub), raw, modifier or None,
                    string_class=sub in t_cfg.string_params,
                )
                # Same scale rule as _has: no forced broadcast of the
                # matched-target id set; AQE picks BHJ iff it is small.
                keys = target.filter(pred).select(F.col(t_cfg.id_col).alias("_k"))
                df = df.join(keys, ref_id(F.col(ref_col)) == F.col("_k"), "left_semi")
            elif modifier == "missing":
                colpath = self._resolve(resource_type, name)
                df = df.filter(
                    F.col(colpath).isNull() if raw == "true" else F.col(colpath).isNotNull()
                )
            elif name in cfg.composite_params:
                # FHIR composite search: every component predicate is
                # evaluated against the SAME array element inside one
                # F.exists — a narrow higher-order expression, no
                # explode, no join, no cross-element false positives.
                arr, comps = cfg.composite_params[name]
                self._check_column(df, resource_type, name, arr)
                elem_type = df.select(F.col(arr)).schema[0].dataType.elementType
                ftypes = {
                    f.name: f.dataType.simpleString() for f in elem_type.fields
                }

                def _elem_pred(parts: list[str]):
                    # factory closes over a COPY of parts (the comma
                    # loop reuses the name); returns the unary lambda
                    # F.exists dispatches on
                    def pred(s):
                        p = None
                        for part, (fld, klass) in zip(parts, comps):
                            lit = F.lit(part)
                            if klass == "number":
                                lit2 = F.lit(
                                    part[2:]
                                    if part[:2] in _PREFIX_OPS and len(part) > 2
                                    else part
                                ).cast(ftypes[fld])
                                if part[:2] in _PREFIX_OPS and len(part) > 2:
                                    c = _PREFIX_OPS[part[:2]](s[fld], lit2)
                                else:
                                    c = s[fld] == lit2
                            else:  # token: exact match
                                c = s[fld] == lit.cast(ftypes[fld])
                            p = c if p is None else (p & c)
                        return p

                    return pred

                ors = None
                for value in raw.split(","):
                    parts = value.split("$")
                    if len(parts) != len(comps):
                        raise ValueError(
                            f"composite '{name}' expects "
                            f"{len(comps)} $-separated components, got "
                            f"{len(parts)} in '{value}'"
                        )
                    p = F.exists(F.col(arr), _elem_pred(parts))
                    ors = p if ors is None else (ors | p)
                df = df.filter(ors)
            elif name in cfg.quantity_params:
                # FHIR quantity search: comparator on the value column,
                # exact token match on system/code when present. Pure
                # column predicates — pushdown-eligible like the
                # number/date comparators beside it; comma = OR,
                # repetition = AND (the closed-range idiom
                # `value-quantity=ge5&value-quantity=le9` composes via
                # the expanded loop like every other param).
                vcol, scol, ccol = cfg.quantity_params[name]
                for c in (vcol, scol, ccol):
                    self._check_column(df, resource_type, name, c)
                ors = None
                for value in raw.split(","):
                    numpart, has_pipe, rest = value.partition("|")
                    if numpart[:2] in _PREFIX_OPS and len(numpart) > 2:
                        p = _PREFIX_OPS[numpart[:2]](
                            F.col(vcol), _typed_lit(df, vcol, numpart[2:])
                        )
                    else:
                        p = F.col(vcol) == _typed_lit(df, vcol, numpart)
                    if has_pipe:
                        system, _, code = rest.partition("|")
                        if system:
                            p = p & (F.col(scol) == F.lit(system))
                        if code:
                            p = p & (F.col(ccol) == F.lit(code))
                    ors = p if ors is None else (ors | p)
                df = df.filter(ors)
            elif name in cfg.array_string_params:
                arr, fld = cfg.array_string_params[name]
                token_class = name in cfg.token_class_params
                ors = None
                for value in raw.split(","):
                    if modifier == "exact" or (token_class and modifier != "contains"):
                        p = F.exists(F.col(arr), lambda s: s[fld] == value)
                    elif modifier == "contains":
                        p = F.exists(
                            F.col(arr), lambda s: F.lower(s[fld]).contains(value.lower())
                        )
                    else:
                        p = F.exists(
                            F.col(arr), lambda s: F.lower(s[fld]).startswith(value.lower())
                        )
                    ors = p if ors is None else (ors | p)
                df = df.filter(ors)
            elif name in cfg.token_params:
                # token search `?code=system|code` / `?code=code` over the
                # coding array (SURVEY §2.7 'Token/code filter'). A bare
                # code matches ANY system (FHIR token grammar); comma = OR.
                # `:below`/`:above` (r12) widen the match to the code's
                # subsumption subtree/ancestry via the configured closure.
                coding_col = cfg.token_params[name]

                def _closure_codes(system: str, code: str, mod: str) -> list[str]:
                    # the query code's subtree (:below) or ancestry
                    # (:above) from the closure dimension — one bounded
                    # collect at plan build (a code system's subtree; the
                    # MIME-lookup scale class), emitted as a literal IN
                    # list so the array predicate stays join-free and
                    # pushdown-shaped
                    if cfg.code_closure is None:
                        raise ValueError(
                            f"token :{mod} on '{name}' needs "
                            "SearchConfig.code_closure (system, ancestor,"
                            " descendant)"
                        )
                    key, out = (
                        ("ancestor", "descendant")
                        if mod == "below"
                        else ("descendant", "ancestor")
                    )
                    cl = cfg.code_closure.filter(F.col(key) == F.lit(code))
                    if system:
                        cl = cl.filter(F.col("system") == F.lit(system))
                    rows = cl.select(out).distinct().collect()
                    return sorted({r[0] for r in rows} | {code})

                def _valueset_members(url: str) -> list[tuple[str, str]]:
                    # the ValueSet expansion — bounded plan-build
                    # collect, like the closure
                    if cfg.value_sets is None:
                        raise ValueError(
                            f"token :{modifier} on '{name}' needs "
                            "SearchConfig.value_sets (url, system, code)"
                        )
                    rows = (
                        cfg.value_sets.filter(F.col("url") == F.lit(url))
                        .select("system", "code")
                        .distinct()
                        .collect()
                    )
                    return sorted((r[0], r[1]) for r in rows)

                def _token_pred(
                    system: str, code: str, value: str = ""
                ) -> Column:
                    # separate helper so the HOF lambda stays unary
                    # (pyspark dispatches on the callable's arity)
                    if modifier in ("in", "not-in"):
                        # the whole comma-segment IS a ValueSet url
                        # (never system|code); membership = any
                        # (system, code) pair of the expansion
                        members = _valueset_members(value)
                        keys = [f"{s}|{c}" for s, c in members]
                        p = F.exists(
                            F.col(coding_col),
                            lambda c: F.concat_ws(
                                "|", c["system"], c["code"]
                            ).isin(keys),
                        )
                        if modifier == "not-in":
                            # null-safe negation (the :not discipline):
                            # rows with NO codings also match
                            return ~F.coalesce(p, F.lit(False))
                        return p
                    if modifier in ("above", "below"):
                        codes = _closure_codes(system, code, modifier)
                        if system:
                            return F.exists(
                                F.col(coding_col),
                                lambda c: (c["system"] == system)
                                & c["code"].isin(codes),
                            )
                        return F.exists(
                            F.col(coding_col), lambda c: c["code"].isin(codes)
                        )
                    if system:
                        return F.exists(
                            F.col(coding_col),
                            lambda c: (c["system"] == system) & (c["code"] == code),
                        )
                    return F.exists(F.col(coding_col), lambda c: c["code"] == code)

                ors = None
                for value in raw.split(","):
                    system, has_pipe, code = value.partition("|")
                    if not has_pipe:
                        system, code = "", value
                    p = _token_pred(system, code, value)
                    ors = p if ors is None else (ors | p)
                df = df.filter(ors)
            elif name in cfg.uri_params and modifier != "not":
                # uri-class search (r12): exact by default (uris are
                # opaque identifiers — never the string-class
                # case-insensitive prefix), `:below` = query is a prefix
                # of the stored uri, `:above` = stored uri is a prefix
                # of the query. Pure column predicates, pushdown-shaped
                # (`:below` compiles to StringStartsWith).
                colpath = self._resolve(resource_type, name)
                self._check_column(df, resource_type, name, colpath)
                ors = None
                for value in raw.split(","):
                    if modifier == "below":
                        p = F.col(colpath).startswith(value)
                    elif modifier == "above":
                        p = F.lit(value).startswith(F.col(colpath))
                    else:
                        p = F.col(colpath) == F.lit(value)
                    ors = p if ors is None else (ors | p)
                df = df.filter(ors)
            elif name in cfg.reference_params and "/" in raw:
                ref_col, _t = cfg.reference_params[name]
                df = df.filter(F.col(ref_col) == F.lit(raw))
            elif modifier == "not":
                # FHIR :not — true when NO value matches, INCLUDING rows
                # where the field is absent (unlike a bare != filter,
                # which three-valued-logic drops nulls)
                colpath = self._resolve(resource_type, name)
                self._check_column(df, resource_type, name, colpath)
                pos = _apply_simple(df, colpath, raw, None, string_class=False)
                df = df.filter(~pos | F.col(colpath).isNull())
            else:
                colpath = self._resolve(resource_type, name)
                self._check_column(df, resource_type, name, colpath)
                df = df.filter(_apply_simple(
                    df, colpath, raw, modifier or None,
                    string_class=name in cfg.string_params,
                ))

        if total_only:
            return df.agg(F.count(F.lit(1)).alias("total"))
        if page_token is not None:
            # keyset pagination: the token is the last page's final row,
            # one value per sort key — O(page) per page (a pushed-down
            # range filter), never the O(offset) skip-scan of numbered
            # pages. The configured unique id column is ALWAYS appended
            # as an ascending tie-break (unless `_sort` already ends on
            # it), and the composite bound is the lexicographic
            # row-value comparison
            #   k1 > b1 OR (k1 = b1 AND k2 > b2) OR …
            # — a strict bound on a single NON-unique key would silently
            # drop rows sharing the boundary value with the last row of
            # the previous page.
            if not sort_fields:
                raise ValueError("_page_token requires _sort")
            if cfg.id_col not in df.columns:
                raise ValueError(
                    f"_page_token needs the unique id column '{cfg.id_col}'"
                    " (configure SearchConfig.id_col)"
                )
            if sort_fields[-1][0] != cfg.id_col:
                sort_fields.append((cfg.id_col, False))
            bounds = page_token.split(PAGE_TOKEN_SEP)
            if len(bounds) != len(sort_fields):
                raise ValueError(
                    f"_page_token carries {len(bounds)} value(s) but the "
                    f"effective sort has {len(sort_fields)} key(s) "
                    f"(_sort plus the '{cfg.id_col}' tie-break); build "
                    "tokens with encode_page_token() from the last row"
                )
            pred = None
            eqs = None
            for (colpath, desc), raw_bound in zip(sort_fields, bounds):
                c = F.col(colpath)
                # Null-aware composite bound, matching Spark's sort-null
                # placement (asc → NULLs first, desc → NULLs last):
                #   asc,  bound NULL    → everything non-null is "after"
                #   asc,  bound non-null→ c > b (NULL c already emitted)
                #   desc, bound non-null→ c < b OR c IS NULL (NULLs last)
                #   desc, bound NULL    → nothing after on this key
                if raw_bound == PAGE_TOKEN_NULL:
                    term = F.lit(False) if desc else c.isNotNull()
                    eq = c.isNull()
                else:
                    b = _typed_lit(df, colpath, raw_bound)
                    term = ((c < b) | c.isNull()) if desc else (c > b)
                    eq = c.eqNullSafe(b)
                if eqs is not None:
                    term = eqs & term
                pred = term if pred is None else pred | term
                eqs = eq if eqs is None else eqs & eq
            df = df.filter(pred)
        elif (
            count is not None
            and sort_fields
            and sort_fields[-1][0] != cfg.id_col
            and cfg.id_col in df.columns
        ):
            # first page of a paged query: same tie-break as later pages
            # so page boundaries are deterministic under non-unique keys
            sort_fields.append((cfg.id_col, False))
        if sort_fields:
            if any(c == "_score" for c, _ in sort_fields) and "_score" not in df.columns:
                raise ValueError("_sort=_score requires a _text parameter")
            df = df.orderBy(
                *[F.col(c).desc() if d else F.col(c).asc() for c, d in sort_fields]
            )
        if count is not None:
            df = df.limit(count)
        # includes join AFTER the limit: only the returned page pays the
        # join, and each is a 1:1 left join (no row multiplication)
        included_types: dict[str, str] = {}
        for rp in includes:
            df = self.include(df, resource_type, rp)
            included_types[f"included_{rp}"] = cfg.reference_params[rp][1]
        # _include:iterate — follow references OF included resources,
        # repeating while new columns appear (depth cap bounds cycles
        # like Organization.partOf)
        for _depth in range(3):
            added: dict[str, str] = {}
            for col, ctype in included_types.items():
                t_cfg = self.configs.get(ctype, SearchConfig())
                for src_t, rp in iterate_specs:
                    if src_t != ctype or rp not in t_cfg.reference_params:
                        continue
                    out_col = f"{col}_{rp}"
                    if out_col in df.columns:
                        continue
                    ref_col, target_type = t_cfg.reference_params[rp]
                    target = self.tables[target_type]
                    t_id = self.configs.get(target_type, SearchConfig()).id_col
                    inc = target.select(
                        F.struct(*target.columns).alias(out_col)
                    ).withColumn("_k", F.col(f"{out_col}.{t_id}"))
                    df = df.join(
                        inc,
                        ref_id(F.col(f"{col}.{ref_col}")) == F.col("_k"),
                        "left",
                    ).drop("_k")
                    added[out_col] = target_type
            if not added:
                break
            included_types.update(added)
        for src_t, rp in revincludes:
            df = self.revinclude(df, src_t, rp)
        if chained_sort_cols and count is None and page_token is None:
            # unpaged: the join-in sort keys are an implementation
            # detail, not part of the resource; paged queries keep them
            # so the caller can build the next page token from the last
            # row (encode_page_token needs every effective sort value)
            df = df.drop(*chained_sort_cols)
        if elements:
            keep = elements + [
                c for c in df.columns
                if c.startswith("included_")
                or c.startswith("revincluded_")
                or c in chained_sort_cols
            ]
            keep = [c for c in keep if c in df.columns]
            df = df.select(*keep)
        return df

    def include(self, df: DataFrame, resource_type: str, ref_param: str) -> DataFrame:
        """``_include``: left-join the referenced resource as a struct
        column named ``included_<param>`` (J7)."""
        cfg = self.configs[resource_type]
        ref_col, target_type = cfg.reference_params[ref_param]
        target = self.tables[target_type]
        t_id = self.configs.get(target_type, SearchConfig()).id_col
        inc = target.select(F.struct(*target.columns).alias(f"included_{ref_param}"))
        inc = inc.withColumn("_k", F.col(f"included_{ref_param}.{t_id}"))
        return df.join(inc, ref_id(F.col(ref_col)) == F.col("_k"), "left").drop("_k")

    def revinclude(self, df: DataFrame, source_type: str, ref_param: str) -> DataFrame:
        """``_revinclude``: left-join rows of ``source_type`` that
        reference the result rows, collected per target row."""
        src_cfg = self.configs[source_type]
        ref_col, _t = src_cfg.reference_params[ref_param]
        src = self.tables[source_type]
        grouped = (
            src.withColumn("_k", ref_id(F.col(ref_col)))
            .groupBy("_k")
            .agg(F.collect_list(F.struct(*[c for c in src.columns])).alias(f"revincluded_{source_type}"))
        )
        t_id = self.configs.get(_t, SearchConfig()).id_col
        return df.join(grouped, df[t_id] == F.col("_k"), "left").drop("_k")
