"""Numeric oracle tests for the Jackson cost analytics, mirroring the
reference's hand-verified assertions (Jackson.hs:204-205, :356;
BASELINE.md)."""

from __future__ import annotations

import math

from striot_spark.cost.jackson import (
    DEFAULT_MAX_NODE_UTIL,
    OperatorSpec,
    analyse,
    arrival_rates,
    is_over_utilised,
    partition_utilisation,
)

# taxi Q1 chain (examples/taxi/generate.hs:34-42): source at 1.2 ev/s,
# in-range filter sel 0.95 at vertex 3, dedup filterAcc sel 0.1 at
# vertex 6; service rates Jackson.hs:198-199.
TAXI_Q1 = [
    OperatorSpec("source", math.inf, 1.0),
    OperatorSpec("map-journey", 10000, 1.0),
    OperatorSpec("filter-range", 10000, 0.95),
    OperatorSpec("window", 10000, 1.0),
    OperatorSpec("topk", 10, 1.0),
    OperatorSpec("filteracc-dedup", 10000, 0.1),
    OperatorSpec("sink", 10000, 1.0),
]


def test_taxi_q1_arrival_rates_match_reference_oracle():
    """The vector the reference asserts in test_taxiQ1arrivalRates
    (Jackson.hs:204-205): [1.2, 1.2, 1.2, 1.14, 1.14, 1.14, 0.114]."""
    lam = arrival_rates(TAXI_Q1, 1.2)
    expected = [1.2, 1.2, 1.2, 1.14, 1.14, 1.14, 0.114]
    assert [round(x, 6) for x in lam] == expected


def test_utilisation_and_viability():
    infos = analyse(TAXI_Q1, 1.2)
    assert not is_over_utilised(infos)
    # topk is the hot operator: rho = 1.14/10
    assert round(infos[4].utilisation, 4) == 0.114
    utils = partition_utilisation(infos, [[0, 1, 2], [3, 4], [5, 6]])
    assert all(u <= DEFAULT_MAX_NODE_UTIL for u in utils)


def test_over_utilised_detection():
    """Pushing the source rate past the topk service rate trips the
    viability check (isOverUtilised, Jackson.hs:346-347)."""
    infos = analyse(TAXI_Q1, 12.0)
    assert infos[4].utilisation > 1
    assert is_over_utilised(infos)
    assert infos[4].mean_customers == float("inf")
