"""Comparator semantics pinned to the reference truth tables
(check_result_utils.py; FIXTURES.md §5)."""

import pandas as pd
import pytest

from georay.compare import (city_similarity, house_number_similarity,
                            keep_bests, postcode_similarity,
                            street_similarity)
from georay.config import (ADDR_KEY, C_SIM_STREET, C_SIM_STREET_WHICH,
                           M_REJECT_REASON)


def test_house_number_compare_cases():
    # check_result_utils.py:56-97
    assert house_number_similarity("10", "10") == 1.0
    assert house_number_similarity("", "") == 0.0            # empty-equal -> 0
    # range rule matches chunk1-of-one vs chunk2-of-other (code at :90-93;
    # the reference docstring example "10 vs 10-12" contradicts its own code)
    assert house_number_similarity("10-12", "12") == 0.8
    assert house_number_similarity("12", "10-12") == 0.8
    assert house_number_similarity("10", "10-12") == 0.0
    assert house_number_similarity("10a", "10 B") == 0.5     # digits-only equal
    assert house_number_similarity("10A", "10") == 0.5
    assert house_number_similarity("10", "11") == 0.0
    assert house_number_similarity("10", "") == 0.0
    # "30 bt 2" splits to [30,'','',2] -> digits 302 vs 30 -> 0
    assert house_number_similarity("30 bt 2", "30") == 0.0


def test_postcode_compare_cases():
    # check_result_utils.py:103-141
    assert postcode_similarity("1060", "1060") == 1.0
    assert postcode_similarity("B-1060", "1060") == 1.0      # country prefix strip
    assert postcode_similarity("1060", "") == 0.1
    assert postcode_similarity("", "") == 1.0                # both empty are equal
    assert postcode_similarity("1060", "1080") == 0.5        # first 2 chars
    assert postcode_similarity("1060", "1360") == 0.3        # first char
    assert postcode_similarity("1060", "4000") == 0.0


def test_street_similarity_exact_and_bilingual():
    assert street_similarity("Avenue Louise", "Avenue Louise") == 1.0
    # bilingual split: either side of " - " may match
    assert street_similarity("Avenue Louise - Louizalaan", "Avenue Louise") == 1.0
    assert street_similarity("Louizalaan", "Avenue Louise - Louizalaan") == 1.0
    # comma behaves like " - " (check_result_utils.py:361)
    assert street_similarity("Bruxelles, Avenue Louise", "Avenue Louise") == 1.0


def test_street_similarity_inclusion_and_fingerprint():
    # inclusion: "Avenue C Berten" ⊂ "Avenue Clovis Berten"
    assert street_similarity("Avenue C Berten", "Avenue Clovis Berten") == 1.0
    # fingerprint: word order insensitive
    assert street_similarity("Rue du Village Bas", "Bas du Village Rue") == 1.0
    # street words stripped: "Avenue Fonsny" vs "Fonsny" match via removal
    assert street_similarity("Avenue Fonsny", "Fonsny") == 1.0
    # both empty -> 1 (nostreet step relies on this)
    assert street_similarity("", "") == 1.0
    assert street_similarity("Avenue Louise", "Place Stephanie") < 0.5


def test_city_similarity():
    assert city_similarity("Bruxelles", "BRUXELLES") == 1.0
    assert city_similarity("Liège", "Liege") == 1.0
    assert city_similarity("", "") == 0.0   # levenshtein_similarity("","") = 0
    assert city_similarity("Gent", "Genk") == pytest.approx(0.75)


def _mkdf(rows):
    return pd.DataFrame(rows)


def test_keep_bests_elimination_and_tail():
    # two candidates for addr 1 (good first), one mismatching for addr 2
    df = _mkdf([
        {ADDR_KEY: "1", "cand_street": "Avenue Fonsny", "cand_hn": "20",
         "cand_pc": "1060", "cand_city": "Saint-Gilles", "in_street": "Avenue Fonsny",
         "in_hn": "20", "in_pc": "1060", "in_city": "Saint-Gilles", "ord": 0},
        {ADDR_KEY: "1", "cand_street": "Avenue Fonsny", "cand_hn": "22",
         "cand_pc": "1060", "cand_city": "Saint-Gilles", "in_street": "Avenue Fonsny",
         "in_hn": "20", "in_pc": "1060", "in_city": "Saint-Gilles", "ord": 1},
        {ADDR_KEY: "2", "cand_street": "Totally Different", "cand_hn": "1",
         "cand_pc": "9999", "cand_city": "Elsewhere", "in_street": "Avenue Louise",
         "in_hn": "1", "in_pc": "1050", "in_city": "Bruxelles", "ord": 0},
    ])
    keep, reject = keep_bests(
        df, street_cols_a=["cand_street"], housenbr_col_a="cand_hn",
        postcode_col_a="cand_pc", city_col_a="cand_city",
        street_col_b="in_street", housenbr_col_b="in_hn",
        postcode_col_b="in_pc", city_col_b="in_city",
        secondary_sort_col="ord")
    assert list(keep[ADDR_KEY]) == ["1"]
    assert keep.iloc[0]["cand_hn"] == "20"   # exact house number wins
    reasons = reject.set_index("ord")[M_REJECT_REASON].to_dict()
    assert reject[reject[ADDR_KEY] == "1"][M_REJECT_REASON].iloc[0] == "tail"
    assert reject[reject[ADDR_KEY] == "2"][M_REJECT_REASON].iloc[0] == "mismatch"


def test_keep_bests_street_priority_short_circuit():
    # first street field already >= threshold -> sim_street_which records it
    df = _mkdf([
        {ADDR_KEY: "1", "s1": "Avenue Fonsny", "s2": "ignored", "hn": "20",
         "pc": "1060", "city": "X", "in_s": "Avenue Fonsny", "in_hn": "20",
         "in_pc": "1060", "in_city": "X", "ord": 0},
    ])
    keep, _ = keep_bests(
        df, street_cols_a=["s1", "s2"], housenbr_col_a="hn",
        postcode_col_a="pc", city_col_a="city", street_col_b="in_s",
        housenbr_col_b="in_hn", postcode_col_b="in_pc", city_col_b="in_city",
        secondary_sort_col="ord")
    assert keep.iloc[0][C_SIM_STREET_WHICH] == "s1"
    assert keep.iloc[0][C_SIM_STREET] == 1.0


def test_keep_bests_postcode_city_rescue():
    # elimination rule: (pc < 0.1 AND city < 0.5) OR street < 0.5
    # street ok + pc empty (0.1) -> NOT eliminated even if city differs
    df = _mkdf([
        {ADDR_KEY: "1", "cs": "Avenue Fonsny", "hn": "", "pc": "",
         "city": "Elsewhere", "in_s": "Avenue Fonsny", "in_hn": "",
         "in_pc": "1060", "in_city": "Saint-Gilles", "ord": 0},
    ])
    keep, reject = keep_bests(
        df, street_cols_a=["cs"], housenbr_col_a="hn", postcode_col_a="pc",
        city_col_a="city", street_col_b="in_s", housenbr_col_b="in_hn",
        postcode_col_b="in_pc", city_col_b="in_city", secondary_sort_col="ord")
    assert len(keep) == 1 and len(reject) == 0


# ---------------------------------------------------------------------------
# property tests (SURVEY §5(d)): range, symmetry of the comparator kernel

from hypothesis import given, settings
from hypothesis import strategies as st

_text = st.text(alphabet="abcdefghij AÉè-,'0123456789", max_size=24)
_hn = st.text(alphabet="0123456789abAB -/", max_size=8)


@settings(max_examples=150, deadline=None)
@given(_text, _text)
def test_street_similarity_range_and_symmetry(a, b):
    s = street_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == street_similarity(b, a)


@settings(max_examples=150, deadline=None)
@given(_text, _text)
def test_city_similarity_range_and_symmetry(a, b):
    s = city_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == city_similarity(b, a)


@settings(max_examples=150, deadline=None)
@given(_hn, _hn)
def test_house_number_similarity_range_and_symmetry(a, b):
    s = house_number_similarity(a, b)
    assert s in (0.0, 0.5, 0.8, 1.0)
    assert s == house_number_similarity(b, a)


@settings(max_examples=150, deadline=None)
@given(_text, _text)
def test_postcode_similarity_range(a, b):
    s = postcode_similarity(a, b)
    assert s in (0.0, 0.1, 0.3, 0.5, 1.0)


@settings(max_examples=80, deadline=None)
@given(_text)
def test_self_similarity_is_one(a):
    # any street equals itself (both-empty included — fast path)
    assert street_similarity(a, a) == 1.0
    # city: reference levenshtein_similarity returns 0.0 when BOTH are
    # empty (check_result_utils.py:147-168) — self-sim holds otherwise
    if a.strip():
        assert city_similarity(a, a) == 1.0
