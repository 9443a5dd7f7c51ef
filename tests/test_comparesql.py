"""Bit-parity of the SQL comparator renderings (comparesql.py) against the
Python kernels (compare.py) — the foundation of the full-output reject /
match-selection oracles.  No Ray needed: pure DuckDB vs pure Python."""

import random

import duckdb
import pytest

from georay import comparesql as cs
from georay.compare import (city_similarity, house_number_similarity,
                            postcode_similarity, street_similarity)
from georay.textkernels import damerau_levenshtein


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _eval(con, expr: str, a: str, b: str) -> float:
    return float(con.execute(
        f"select {expr} from (select ? as a, ? as b)", [a, b]).fetchone()[0])


def test_damerau_levenshtein_builtin_parity(con):
    random.seed(7)
    cases = [("CA", "ABC"), ("ab", "ba"), ("", ""), ("x", "")]
    for _ in range(500):
        cases.append((
            "".join(random.choices("ABC DE", k=random.randint(0, 9))),
            "".join(random.choices("ABC DE", k=random.randint(0, 9)))))
    for a, b in cases:
        got = con.execute("select damerau_levenshtein(?,?)",
                          [a, b]).fetchone()[0]
        assert got == damerau_levenshtein(a, b), (a, b)


def test_street_sim_parity(con):
    expr = cs.sql_street_sim("a", "b")
    streets = ["Avenue Fonsny", "FONSNY (AVE. DE)", "av. Fonsny",
               "Neuvestraat", "Place Neuve", "Avenue Basse - Bassesteenweg",
               "Rue de Louise, Louizalaan", "", "Rue", "Chaussée de Gand",
               "  weird  spacing ", "X,Y", "AVENUE C BERTEN",
               "Avenue Clovis Berten", "rue du bas du village"]
    random.seed(3)
    for _ in range(60):
        streets.append("".join(random.choices("ABC de éà-,. ",
                                              k=random.randint(0, 14))))
    for a in streets:
        for b in streets[:15]:
            assert _eval(con, expr, a, b) == street_similarity(a, b), (a, b)


def test_hn_pc_city_parity(con):
    random.seed(11)
    hn_expr = cs.sql_hn_sim("a", "b")
    hns = ["", "10", "10-12", "12", "30 bt 2", "12a", "10 12", "0", "007"]
    hns += ["".join(random.choices("0123456789-ab ", k=random.randint(0, 6)))
            for _ in range(40)]
    for a in hns:
        for b in hns:
            assert _eval(con, hn_expr, a, b) == \
                house_number_similarity(a, b), (a, b)

    pc_expr = cs.sql_pc_sim("a", "b")
    pcs = ["1000", "B-1000", "1050", "", "A1000", "2000", "B1000", "10"]
    pcs += ["".join(random.choices("0123456789B- ", k=random.randint(0, 5)))
            for _ in range(30)]
    for a in pcs:
        for b in pcs:
            assert _eval(con, pc_expr, a, b) == postcode_similarity(a, b)

    city_expr = cs.sql_city_sim("a", "b")
    cities = ["Bruxelles", "BRUXELLES", "Ixelles ", "Saint-Gilles",
              "sint gillis", "", "Gent  Gand", "Liège"]
    cities += ["".join(random.choices("ABc déè- ", k=random.randint(0, 10)))
               for _ in range(30)]
    for a in cities:
        for b in cities:
            assert _eval(con, city_expr, a, b) == city_similarity(a, b)


def test_street_priority_fold(con):
    # short-circuit semantics: first field >= threshold wins, else LAST
    sim, which = cs.sql_street_priority("s1", "s2", "s3")
    rows = [(0.9, 0.0, 0.0, 0.9, "o_street_name"),
            (0.4, 0.7, 0.1, 0.7, "o_other"),
            (0.4, 0.3, 0.2, 0.2, "n_namedetails"),
            (0.5, 0.0, 0.9, 0.5, "o_street_name")]
    for s1, s2, s3, want_sim, want_which in rows:
        got = con.execute(
            f"select {sim}, {which} from (select ?::DOUBLE s1, "
            "?::DOUBLE s2, ?::DOUBLE s3)", [s1, s2, s3]).fetchone()
        assert got[0] == pytest.approx(want_sim)
        assert got[1] == want_which


def test_haversine_parity(con):
    import numpy as np

    from georay.geom import haversine_km
    random.seed(5)
    expr = cs.sql_haversine_km("a1", "o1", "a2", "o2")
    for _ in range(200):
        a1, a2 = random.uniform(49, 52), random.uniform(49, 52)
        o1, o2 = random.uniform(2, 6), random.uniform(2, 6)
        got = float(con.execute(
            f"select {expr} from (select ?::DOUBLE a1, ?::DOUBLE o1, "
            "?::DOUBLE a2, ?::DOUBLE o2)", [a1, o1, a2, o2]).fetchone()[0])
        want = float(haversine_km(np.array([a1]), np.array([o1]),
                                  np.array([a2]), np.array([o2]))[0])
        # round-3 is what the pipeline stores; parity must hold there
        assert round(got, 3) == round(want, 3)
        assert abs(got - want) < 1e-9
