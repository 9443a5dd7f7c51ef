"""REST-semantics parity tests: /geocode, /batchGeocode, /health behaviors
(SURVEY.md §2.1; API contract nominatimwrapper.py:339-453)."""

import pytest

from georay.api import (batch_geocode, geocode_one, health_check,
                        row_to_nested, to_camel_case)
from georay.gazetteer import GazetteerSpec, get_gazetteer

SPEC = GazetteerSpec()


@pytest.fixture(scope="module")
def street():
    gaz = get_gazetteer(SPEC)
    return gaz.places[gaz.places.place_rank == 26].iloc[0]


def _payload(st, key="1"):
    return {"addr_key": key, "street_name": st["name"], "house_number": "4",
            "post_code": st["post_code"], "post_name": st["post_name"],
            "country_name": "Belgium"}


def test_to_camel_case():
    # utils.py:76-103
    assert to_camel_case("street_name") == "streetName"
    assert to_camel_case("match_on_cleansed_house_number") == \
        "matchOnCleansedHouseNumber"
    assert to_camel_case("lat") == "lat"


def test_geocode_one_nested_shape(street):
    res = geocode_one(_payload(street), mode="long")
    assert len(res["match"]) == 1
    m = res["match"][0]
    assert m["input"]["streetName"] == street["name"]
    assert m["metadata"]["method"] == "orig"
    assert isinstance(m["metadata"]["placeId"], int)
    assert isinstance(m["output"]["lat"], float)
    assert m["output"]["houseNumber"] == "4"
    # empty leaves are dropped (utils.py:218)
    assert "rejectReason" not in m["metadata"]


def test_geocode_modes(street):
    coords = geocode_one(_payload(street), mode="coordinates")
    m = coords["match"][0]
    assert set(m.keys()) <= {"input", "output"}
    assert set(m["output"].keys()) == {"lat", "lon"}
    short = geocode_one(_payload(street), mode="short")
    assert "check" not in short["match"][0]
    long_ = geocode_one(_payload(street), mode="long")
    assert "check" in long_["match"][0]
    with pytest.raises(ValueError):
        geocode_one(_payload(street), mode="bogus")


def test_fastmode_direct_hit(street):
    res = geocode_one(_payload(street), fastmode=True, check_result=False)
    m = res["match"][0]
    assert m["metadata"]["method"] == "fast"
    assert m["metadata"]["placeRank"] == 30
    assert m["metadata"]["osmOrder"] == 0


def test_fastmode_cleansed_retry(street):
    p = _payload(street)
    p["house_number"] = "4 bt 2"
    res = geocode_one(p, fastmode=True, check_result=False)
    m = res["match"][0]
    assert m["metadata"]["placeRank"] == 30
    assert m["metadata"].get("matchOnCleansedHouseNumber") is True


def test_batch_geocode_dup_key_rejected(street):
    with pytest.raises(ValueError, match="duplicate"):
        batch_geocode([_payload(street, "1"), _payload(street, "1")])
    with pytest.raises(ValueError, match="mandatory"):
        batch_geocode([{"street_name": "x"}])


def test_batch_geocode_end_to_end(street):
    gaz = get_gazetteer(SPEC)
    s2 = gaz.places[gaz.places.place_rank == 26].iloc[1]
    res = batch_geocode([_payload(street, "1"), _payload(s2, "2")],
                        with_rejected=True)
    keys = sorted(m["input"]["referenceKey"] for m in res["match"])
    assert keys == ["1", "2"]


def test_health_check():
    h = health_check(SPEC)
    assert h["status"] == "UP"
    assert set(h["services"]) == {"gazetteer", "parser", "fuzzy"}


def test_full_address_only(street):
    # free-text input mode (nominatimwrapper.py:571-586): the whole
    # string lands in the street field and the cascade resolves it
    full = (f"{street['name']} 4, {street['post_code']} "
            f"{street['post_name']}, Belgium")
    res = geocode_one({"addr_key": "fa1", "full_address": full},
                      check_result=False)
    assert len(res["match"]) == 1
    m = res["match"][0]
    assert isinstance(m["metadata"]["placeId"], int)
    assert m["input"]["streetName"] == full  # street carries the raw text


def test_full_address_mutual_exclusion(street):
    full = f"{street['name']} 4, {street['post_code']} {street['post_name']}"
    with pytest.raises(ValueError, match="full_address"):
        geocode_one({"addr_key": "1", "full_address": full,
                     "street_name": street["name"]}, check_result=False)
    with pytest.raises(ValueError, match="check_result"):
        geocode_one({"addr_key": "1", "full_address": full},
                    check_result=True)
    from georay.config import PipelineConfig
    with pytest.raises(ValueError, match="osm_structured"):
        geocode_one({"addr_key": "1", "full_address": full},
                    check_result=False,
                    cfg=PipelineConfig(osm_structured=True,
                                       check_results=False))


def test_full_address_structured_parity(street):
    # the two input forms must resolve to the same place
    full = (f"{street['name']} 4, {street['post_code']} "
            f"{street['post_name']}, Belgium")
    via_full = geocode_one({"addr_key": "p1", "full_address": full},
                           check_result=False)
    via_fields = geocode_one(_payload(street), check_result=False)
    assert via_full["match"][0]["metadata"]["placeId"] == \
        via_fields["match"][0]["metadata"]["placeId"]


def test_batch_full_address(street):
    full = (f"{street['name']} 4, {street['post_code']} "
            f"{street['post_name']}, Belgium")
    res = batch_geocode([{"addr_key": "b1", "full_address": full}],
                        check_result=False)
    assert len(res["match"]) == 1


def test_long_mode_candidate_json(street):
    import json
    res = geocode_one(_payload(street), mode="long")
    m = res["match"][0]
    raw = json.loads(m["metadata"]["candidateJson"])
    # full-fidelity tail: the raw geocoder record round-trips
    assert raw["place_id"] == m["metadata"]["placeId"]
    assert raw["address"]["postcode"] == street["post_code"]
    assert "display_name" in raw and "place_rank" in raw
    # short mode carries no candidate tail
    short = geocode_one(_payload(street), mode="short")
    assert "candidateJson" not in short["match"][0].get("metadata", {})


def test_batch_geocode_csv_parity(street, tmp_path):
    # CSV source == dict source row for row (the reference's
    # /batchGeocode file-upload path, nominatimwrapper.py:709-769)
    import csv as _csv

    from georay.api import batch_geocode_csv

    p1 = _payload(street, "1")
    path = tmp_path / "batch.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(p1))
        w.writeheader()
        w.writerow(p1)
    res_csv = batch_geocode_csv(str(path), with_rejected=True)
    res_dict = batch_geocode([p1], with_rejected=True)
    assert res_csv == res_dict
    # bytes input behaves like a path
    res_bytes = batch_geocode_csv(open(path, "rb").read(),
                                  with_rejected=True)
    assert res_bytes == res_dict


def test_batch_geocode_csv_dup_key(street, tmp_path):
    import csv as _csv

    from georay.api import batch_geocode_csv

    p1 = _payload(street, "1")
    path = tmp_path / "dup.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(p1))
        w.writeheader()
        w.writerow(p1)
        w.writerow(p1)
    with pytest.raises(ValueError, match="duplicate"):
        batch_geocode_csv(str(path))


def test_csv_dataset_streaming_source(street, tmp_path, ray_session):
    # streaming CSV -> Dataset -> full pipeline parity on keys
    import csv as _csv

    from georay.api import csv_dataset
    from georay.config import PipelineConfig
    from georay.pipeline import geocode_addresses

    p1 = _payload(street, "1")
    path = tmp_path / "stream.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(p1))
        w.writeheader()
        w.writerow(p1)
    ds = csv_dataset(str(path))
    assert ds.schema().types[0] == __import__("pyarrow").string()
    out = geocode_addresses(ds, SPEC, PipelineConfig()).to_pandas()
    # cascade output carries one row per surviving candidate; every
    # row must trace back to the single CSV input key
    assert set(out["addr_key"]) == {"1"} and len(out) >= 1


def test_json_dataset_streaming_source(street, tmp_path, ray_session):
    import json as _json

    from georay.api import json_dataset
    from georay.config import PipelineConfig
    from georay.pipeline import geocode_addresses

    p1 = _payload(street, "1")
    path = tmp_path / "stream.json"
    with open(path, "w") as f:
        f.write(_json.dumps(p1) + "\n")
    ds = json_dataset(str(path))
    out = geocode_addresses(ds, SPEC, PipelineConfig()).to_pandas()
    assert set(out["addr_key"]) == {"1"} and len(out) >= 1
