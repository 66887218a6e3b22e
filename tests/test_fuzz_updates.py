"""Differential fuzzer for SPARQL Update SEQUENCES (round-9; VERDICT
item 7): random chains of INSERT DATA / DELETE DATA / DELETE WHERE /
DELETE-INSERT-WHERE run through the engine's ``Store.update`` AND an
independent pure-Python set-of-quads model, comparing the FULL final
dataset.  Updates were the one surface the query fuzzer never touched.

The model is exact for the generated fragment: ground templates over a
closed IRI/literal vocabulary, single-triple-pattern WHERE clauses, and
semantics per SPARQL 1.1 Update §3.1.3: solutions bind against the
PRE-state, deletes apply before inserts, the dataset is a set."""

import random

import pytest

from oxigraph_spark.operators.update import MutableQuadSource
from oxigraph_spark.store import Store

IRIS = [f"http://ex/{n}" for n in ("a", "b", "c", "d")]
PREDS = [f"http://ex/{n}" for n in ("p", "q", "r")]
LITS = ["v1", "v2", "v3"]
GRAPHS = [None, "http://ex/g1", "http://ex/g2"]


def _tok(term):
    kind, lex = term
    return f"<{lex}>" if kind == "iri" else f'"{lex}"'


def _rand_term(rng, allow_lit=True):
    if allow_lit and rng.random() < 0.4:
        return ("lit", rng.choice(LITS))
    return ("iri", rng.choice(IRIS))


def _rand_quad(rng):
    return (("iri", rng.choice(IRIS)), ("iri", rng.choice(PREDS)),
            _rand_term(rng), rng.choice(GRAPHS))


def _wrap(graph, inner):
    return f"GRAPH <{graph}> {{ {inner} }}" if graph else inner


class _Model:
    """Independent set-of-quads semantics (graph name None = default)."""

    def __init__(self):
        self.quads = set()

    def insert_data(self, quads):
        self.quads |= set(quads)

    def delete_data(self, quads):
        self.quads -= set(quads)

    def _matches(self, s, p, o, g):
        """Single triple pattern; None components are variables."""
        out = []
        for (qs, qp, qo, qg) in self.quads:
            if qg != g:
                continue
            if s is not None and qs != s:
                continue
            if p is not None and qp != p:
                continue
            if o is not None and qo != o:
                continue
            out.append((qs, qp, qo))
        return out

    def delete_where(self, p, g):
        """DELETE WHERE { [GRAPH g] ?s <p> ?o }"""
        hits = self._matches(None, ("iri", p), None, g)
        self.quads -= {(s, pp, o, g) for (s, pp, o) in hits}

    def delete_insert(self, p_match, p_new, g):
        """DELETE { ?s <p_match> ?o } INSERT { ?s <p_new> ?o }
        WHERE { ?s <p_match> ?o } — all within graph g."""
        hits = self._matches(None, ("iri", p_match), None, g)
        self.quads -= {(s, ("iri", p_match), o, g) for (s, _, o) in hits}
        self.quads |= {(s, ("iri", p_new), o, g) for (s, _, o) in hits}


def _gen_op(rng, model):
    kind = rng.choice(["insert", "insert", "delete_data", "delete_where",
                       "delete_insert"])
    if kind == "insert":
        quads = [_rand_quad(rng) for _ in range(rng.randint(1, 4))]
        body = " ".join(
            _wrap(g, f"{_tok(s)} {_tok(p)} {_tok(o)} .")
            for (s, p, o, g) in quads)
        model.insert_data(quads)
        return f"INSERT DATA {{ {body} }}"
    if kind == "delete_data":
        # delete a mix of present and absent quads (absent = no-op)
        present = list(model.quads)
        quads = [rng.choice(present) for _ in
                 range(min(2, len(present)))] if present else []
        quads += [_rand_quad(rng)]
        body = " ".join(
            _wrap(g, f"{_tok(s)} {_tok(p)} {_tok(o)} .")
            for (s, p, o, g) in quads)
        model.delete_data(quads)
        return f"DELETE DATA {{ {body} }}"
    if kind == "delete_where":
        p, g = rng.choice(PREDS), rng.choice(GRAPHS)
        model.delete_where(p, g)
        return f"DELETE WHERE {{ {_wrap(g, f'?s <{p}> ?o .')} }}"
    p1, p2, g = rng.choice(PREDS), rng.choice(PREDS), rng.choice(GRAPHS)
    model.delete_insert(p1, p2, g)
    return (f"DELETE {{ {_wrap(g, f'?s <{p1}> ?o .')} }} "
            f"INSERT {{ {_wrap(g, f'?s <{p2}> ?o .')} }} "
            f"WHERE {{ {_wrap(g, f'?s <{p1}> ?o .')} }}")


def _store_state(store):
    out = set()
    for r in store.source.quads().collect():
        def t(x):
            return (("iri", x["lex"]) if x["kind"] == 0
                    else ("lit", x["lex"]))
        g = None if r["g"]["lex"] == "" else r["g"]["lex"]
        out.add((t(r["s"]), t(r["p"]), t(r["o"]), g))
    return out


@pytest.mark.parametrize("seed", range(10))
def test_update_sequence_differential(spark, seed):
    rng = random.Random(1000 + seed)
    model = _Model()
    ops = [_gen_op(rng, model) for _ in range(6)]

    from oxigraph_spark.sources.rdf_io import _quads_df
    st = Store(spark, MutableQuadSource(spark, _quads_df(spark, [])))
    st = st.update(" ;\n".join(ops))

    got = _store_state(st)
    exp = {(s, p, o, g) for (s, p, o, g) in model.quads}
    assert got == exp, (f"seed {seed}:\n  ops={ops}\n"
                       f"  only-engine={got - exp}\n"
                       f"  only-model={exp - got}")
