"""Parser unit tests — pure Python, no SparkSession (fast)."""

import pytest

from oxigraph_spark.algebra import ast as A
from oxigraph_spark.algebra.parser import ParseError, parse_query, parse_update


def test_select_shapes():
    q = parse_query("SELECT * WHERE { ?s ?p ?o }")
    assert isinstance(q, A.SelectQuery)
    assert isinstance(q.pattern, A.Project)


def test_prefix_and_base():
    q = parse_query("""
        BASE <http://ex.org/>
        PREFIX f: <http://ex.org/f#>
        SELECT ?x WHERE { ?x f:p <rel> }""")
    bgp = _find(q.pattern, A.BGP)
    tp = bgp.patterns[0]
    assert tp.p.iri == "http://ex.org/f#p"
    assert tp.o.iri == "http://ex.org/rel"


def test_numeric_literal_types():
    q = parse_query("SELECT ?x WHERE { ?x ?p ?v . FILTER(?v > 3 || ?v > 3.5 || ?v > 3.5e2) }")
    f = _find(q.pattern, A.Filter)
    ops = []

    def walk(e):
        if isinstance(e, A.EOp):
            for a in e.args:
                walk(a)
        if isinstance(e, A.ETerm) and isinstance(e.term, A.Literal):
            ops.append(e.term.datatype.rsplit("#", 1)[1])
    walk(f.expr)
    assert ops == ["integer", "decimal", "double"]


def test_negative_numbers_and_strings():
    q = parse_query("""SELECT ?x WHERE {
        ?x <urn:p> -5 ; <urn:q> 'a\\'s' ; <urn:r> \"\"\"long\nstring\"\"\"@en }""")
    bgp = _find(q.pattern, A.BGP)
    objs = [tp.o for tp in bgp.patterns]
    assert objs[0].lex == "-5"
    assert objs[1].lex == "a's"
    assert objs[2].lang == "en" and "\n" in objs[2].lex


def test_escapes_and_unicode():
    q = parse_query(r'SELECT ?x WHERE { ?x <urn:p> "tab\there é" }')
    bgp = _find(q.pattern, A.BGP)
    assert bgp.patterns[0].o.lex == "tab\there é"


def test_bnode_property_list_and_collections():
    q = parse_query("SELECT ?x WHERE { ?x <urn:p> [ <urn:q> ( 1 2 ) ] }")
    bgp = _find(q.pattern, A.BGP)
    # [..] → 1 triple, plus collection desugars to 4 first/rest triples
    assert len(bgp.patterns) == 6


def test_path_precedence():
    q = parse_query("ASK { ?x <urn:a>/<urn:b>|^<urn:c>+ ?y }")
    pp = _find(q.pattern, A.PathPattern)
    assert isinstance(pp.path, A.PAlt)
    assert isinstance(pp.path.left, A.PSeq)
    assert isinstance(pp.path.right, A.PInv)
    assert isinstance(pp.path.right.inner, A.POneOrMore)


def test_aggregate_hoisting():
    q = parse_query("""
        SELECT ?g (SUM(?v) + 1 AS ?s) WHERE { ?x <urn:g> ?g ; <urn:v> ?v }
        GROUP BY ?g HAVING (COUNT(*) > 2) ORDER BY DESC(SUM(?v)) LIMIT 3""")
    grp = _find(q.pattern, A.Group)
    # SUM hoisted from projection + COUNT from HAVING + SUM from ORDER BY
    assert len(grp.aggregates) == 3
    assert isinstance(q.pattern, A.Slice)


def test_implicit_group_for_bare_aggregate():
    q = parse_query("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }")
    grp = _find(q.pattern, A.Group)
    assert grp.by == ()


def test_values_undef():
    q = parse_query("""SELECT ?a WHERE { VALUES (?a ?b) { (1 UNDEF) (UNDEF 2) } }""")
    v = _find(q.pattern, A.Values)
    assert v.rows[0][1] is None and v.rows[1][0] is None


def test_nested_optional_filter_scope():
    q = parse_query("""
        SELECT ?x WHERE { ?x <urn:p> ?y OPTIONAL { ?y <urn:q> ?z FILTER(?z > ?y) } }""")
    lj = _find(q.pattern, A.LeftJoin)
    assert lj.expr is not None  # filter folded into the LeftJoin condition


def test_update_forms():
    ops = parse_update("""
        PREFIX ex: <urn:ex:>
        INSERT DATA { ex:a ex:p 1 . GRAPH ex:g { ex:b ex:q "x" } } ;
        DELETE WHERE { ?s ex:gone ?o } ;
        CLEAR NAMED ;
        COPY DEFAULT TO ex:g2
    """)
    from oxigraph_spark.operators import update as U
    assert isinstance(ops[0], U.InsertData) and len(ops[0].quads) == 2
    assert ops[0].quads[1].g.iri == "urn:ex:g"
    assert isinstance(ops[1], U.DeleteInsert) and ops[1].pattern is None
    assert isinstance(ops[2], U.Clear) and ops[2].target == "NAMED"
    assert isinstance(ops[3], U.CopyMoveAdd) and ops[3].src is None


def test_errors_have_positions():
    with pytest.raises(ParseError):
        parse_query("SELECT ?x WHERE { ?x <urn:p ?y }")
    with pytest.raises(ParseError):
        parse_query("SELECT ?x WHERE { FILTER() }")


def test_group_by_projection_validation():
    """§18.2.4.4: a projected variable must be grouped or aggregated;
    SELECT * is incompatible with grouping; aggregates are illegal in
    WHERE-level FILTER (they are only in scope after Group)."""
    with pytest.raises(ParseError, match="neither"):
        parse_query(
            "SELECT ?a ?b WHERE { ?a <urn:p> ?b } GROUP BY ?a")
    with pytest.raises(ParseError, match="SELECT [*]"):
        parse_query(
            "SELECT * WHERE { ?a <urn:p> ?b } GROUP BY ?a")
    with pytest.raises(ParseError, match="aggregate"):
        parse_query(
            "SELECT ?a WHERE { ?a <urn:p> ?b FILTER(COUNT(?b) > 1) }")
    with pytest.raises(ParseError, match="HAVING"):
        parse_query("SELECT ?a (SUM(?b) AS ?s) WHERE { ?a <urn:p> ?b . "
                    "?a <urn:q> ?c } GROUP BY ?a HAVING (?c > 1)")
    with pytest.raises(ParseError, match="ORDER BY"):
        parse_query("SELECT ?a (SUM(?b) AS ?s) WHERE { ?a <urn:p> ?b . "
                    "?a <urn:q> ?c } GROUP BY ?a ORDER BY ?c")
    # legal forms still parse
    parse_query("SELECT ?a (SUM(?b) AS ?s) WHERE { ?a <urn:p> ?b } "
                "GROUP BY ?a")
    parse_query("SELECT ?a WHERE { ?a <urn:p> ?b } GROUP BY ?a")
    # grouped var in HAVING; aggregate + SELECT alias in ORDER BY
    parse_query("SELECT ?a (SUM(?b) AS ?s) WHERE { ?a <urn:p> ?b } "
                "GROUP BY ?a HAVING (STRLEN(?a) > 2 && COUNT(*) > 1) "
                "ORDER BY DESC(?s) SUM(?b) ?a")


def _find(node, cls):
    """DFS for the first node of a class in the pattern tree."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, cls):
            return n
        for attr in ("inner", "left", "right", "pattern"):
            child = getattr(n, attr, None)
            if child is not None and not isinstance(child, (str, tuple)):
                stack.append(child)
        if isinstance(n, A.BGP):
            stack.extend(n.patterns)
    raise AssertionError(f"no {cls.__name__} found")


def test_store_explain(spark):
    """explain() returns algebra + Spark plan without executing."""
    from tests.test_semantics import iri, lit, quads_store
    st = quads_store(spark, [(iri("a"), iri("p"), lit("v"))])
    out = st.explain(
        "SELECT ?o WHERE { <urn:ex:a> <urn:ex:p> ?o }", "formatted")
    assert "SPARQL algebra" in out
    assert "Physical Plan" in out or "Exchange" in out or "Scan" in out


def test_bnode_label_scoping(spark):
    """Grammar note: a bnode label may not span two group patterns."""
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    import pytest as _pytest
    parse_query("SELECT ?x WHERE { _:b <urn:p> ?x . _:b <urn:q> ?x }")
    with _pytest.raises(ParseError):
        parse_query(
            "SELECT ?x WHERE { { _:b <urn:p> ?x } { _:b <urn:q> ?x } }")
    with _pytest.raises(ParseError):
        parse_query(
            "SELECT ?x WHERE { _:b <urn:p> ?x "
            "OPTIONAL { _:b <urn:q> ?x } }")


def test_group_validation_select_expressions():
    """§18.2.4.4 also applies to free variables INSIDE SELECT
    expressions (ADVICE r3): SELECT (?b + 1 AS ?x) … GROUP BY ?a must
    raise, while grouped vars, aggregates, and earlier SELECT aliases
    remain usable."""
    import pytest as _pytest
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    with _pytest.raises(ParseError, match="SELECT expression"):
        parse_query("SELECT (?b + 1 AS ?x) WHERE { ?a <urn:p> ?b } "
                    "GROUP BY ?a")
    # grouped variable inside an expression: fine
    parse_query("SELECT (?a + 1 AS ?x) WHERE { ?a <urn:p> ?b } "
                "GROUP BY ?a")
    # aggregate argument vars are exempt; earlier aliases are in scope
    parse_query("SELECT (SUM(?b) AS ?s) (?s * 2 AS ?d) "
                "WHERE { ?a <urn:p> ?b } GROUP BY ?a")
    # a later alias is NOT in scope for an earlier expression
    with _pytest.raises(ParseError, match="SELECT expression"):
        parse_query("SELECT (?d * 2 AS ?s) (SUM(?b) AS ?d) "
                    "WHERE { ?a <urn:p> ?b } GROUP BY ?a")


def test_bind_in_scope_variable_rejected():
    """Grammar note 12 (§19.8): BIND's target must not already be
    in-scope in the group; MINUS right sides and non-projected subquery
    variables do not count as in-scope."""
    import pytest as _pytest
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    with _pytest.raises(ParseError, match="already in scope"):
        parse_query("SELECT ?o WHERE { ?s <urn:p> ?o BIND(1 AS ?o) }")
    with _pytest.raises(ParseError, match="already in scope"):
        parse_query("SELECT ?x WHERE { BIND(1 AS ?x) BIND(2 AS ?x) }")
    # legal: target only used in LATER elements
    parse_query("SELECT ?o WHERE { BIND(1 AS ?o) ?s <urn:p> ?o }")
    # legal: var appears only in a MINUS right side (not in-scope)
    parse_query("SELECT ?z WHERE { ?s <urn:p> ?x "
                "MINUS { ?y <urn:q> ?z } BIND(1 AS ?z) }")
    # legal: var not projected out of the subselect
    parse_query("SELECT ?v WHERE { { SELECT ?s WHERE "
                "{ ?s <urn:p> ?v } } BIND(2 AS ?v) }")


def test_select_and_groupby_alias_scope_rejected():
    """Grammar note 12 also covers SELECT-expression and GROUP BY AS
    assignments: the target must not be in-scope of the WHERE pattern,
    and SELECT aliases must be unique."""
    import pytest as _pytest
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    with _pytest.raises(ParseError, match="already in scope"):
        parse_query("SELECT (1 AS ?o) WHERE { ?s <urn:p> ?o }")
    with _pytest.raises(ParseError, match="more than once"):
        parse_query("SELECT (1 AS ?x) (2 AS ?x) WHERE { ?s <urn:p> ?o }")
    with _pytest.raises(ParseError, match="GROUP BY assigns"):
        parse_query("SELECT ?o WHERE { ?s <urn:p> ?o } "
                    "GROUP BY (STR(?o) AS ?o)")
    # legal shapes stay legal
    parse_query("SELECT (1 AS ?x) WHERE { ?s <urn:p> ?o }")
    parse_query("SELECT (SUM(?o) AS ?t) (?t+1 AS ?u) WHERE "
                "{ ?s <urn:p> ?o } GROUP BY ?s")
    parse_query("SELECT ?o WHERE { ?s <urn:p> ?x } "
                "GROUP BY (STR(?x) AS ?o)")


def test_nested_aggregates_rejected():
    import pytest as _pytest
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    with _pytest.raises(ParseError, match="cannot nest"):
        parse_query("SELECT (SUM(COUNT(?x)) AS ?c) WHERE { ?s <urn:p> ?x }")
    with _pytest.raises(ParseError, match="cannot nest"):
        parse_query("SELECT (MAX(1 + MIN(?x)) AS ?c) WHERE "
                    "{ ?s <urn:p> ?x }")
    # non-nested composition stays fine
    parse_query("SELECT (SUM(?x) + COUNT(*) AS ?c) WHERE "
                "{ ?s <urn:p> ?x }")


def test_truncated_unicode_escapes_rejected():
    """UCHAR requires exactly 4 (\\u) / 8 (\\U) HEX digits: a literal
    ending in "\\u12" must reject, not silently decode as U+0012
    (round-8 ADVICE fix)."""
    import pytest as _pytest
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    for bad in (r'"x\u12"', r'"x\u12G4"', r'"x\U0001F60"', r'"\u"'):
        with _pytest.raises(ParseError, match="escape"):
            parse_query(f"SELECT * WHERE {{ ?s ?p {bad} }}")
    # exact-length escapes still decode
    q = parse_query(r'SELECT * WHERE { ?s ?p "xA\U0001F600" }')
    lit = q.pattern.inner.patterns[0].o
    assert lit.lex == "xA\U0001F600"
