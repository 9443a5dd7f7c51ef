"""Cross-parallelism determinism (FIXTURES.md §6): the same input at
different partition counts yields identical result row-sets — the
sandbox stand-in for the N-vs-4N cluster-size identity check."""

import pandas as pd

import ray.data

from georay.corpus import make_addresses
from georay.gazetteer import GazetteerSpec
from georay.pipeline import geocode_addresses, geocode_documents, \
    synth_documents_dataset

SPEC = GazetteerSpec()

KEYCOLS = ["addr_key", "status", "m_method", "m_place_id", "m_place_rank",
           "o_lat", "o_lon", "hex_cell", "quad_cell", "pip_ok"]


def _canon(df: pd.DataFrame, cols) -> pd.DataFrame:
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def test_addresses_identical_across_partitionings(ray_session):
    addrs = make_addresses(60, spec=SPEC, seed=21).drop(
        columns=["truth_class", "truth_street_place_id"])
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_pandas(addrs).repartition(parts)
        outs.append(geocode_addresses(ds, spec=SPEC,
                                      batch_size=16).to_pandas())
    pd.testing.assert_frame_equal(_canon(outs[0], KEYCOLS),
                                  _canon(outs[1], KEYCOLS),
                                  check_dtype=False)


def test_documents_identical_across_partitionings(ray_session):
    outs = []
    for parts in (1, 4):
        docs = synth_documents_dataset(40, spec=SPEC, seed=5,
                                       parallelism=parts)
        res = geocode_documents(docs, spec=SPEC, batch_size=64,
                                with_knn_rescue=False)
        outs.append(res.to_pandas())
    cols = [c for c in KEYCOLS if c in outs[0].columns]
    pd.testing.assert_frame_equal(_canon(outs[0], cols),
                                  _canon(outs[1], cols),
                                  check_dtype=False)
