"""Jackson open-queueing-network cost analytics (advisory module).

Reference parity: StrIoT costs candidate plans with a Jackson network —
arrival rates λ = (I − Pᵀ)⁻¹ a from filter selectivities, utilisation
ρ = λ/μ, M/M/1 response/queue times, and viability limits
(``src/Striot/Jackson.hs:104-149,215-341``; limits
``CompileIoT.hs:118-119``). On Spark the *deployment* decision this fed
is owned by the scheduler + AQE (SURVEY.md §4.3), so this module is
advisory only: rate/backpressure sanity checks for streaming pipelines
(e.g. "operator X is over-utilised at the declared input rate — shard
the key or raise parallelism").

Numeric oracle: the taxi-Q1 arrival-rate vector the reference asserts in
its own tests (``Jackson.hs:204-205``; BASELINE.md row 4) is reproduced
in ``tests/test_jackson.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_MAX_NODE_UTIL = 3.0  # CompileIoT.hs:118
DEFAULT_MAX_BANDWIDTH = 200.0  # bytes/s, CompileIoT.hs:119
TCP_OVERHEAD_BYTES = 60  # per-event wire weighting, Bandwidth.hs:166-168


@dataclass(frozen=True)
class OperatorSpec:
    """One vertex: service rate μ (events/s it can process) and the
    selectivity of its outgoing edge (fraction of inputs propagated —
    <1 for filters/filterAcc, >1 possible for expand)."""

    name: str
    service_rate: float  # μ; inf for free operators
    selectivity: float = 1.0


@dataclass(frozen=True)
class OperatorInfo:
    """Per-operator steady-state figures (Jackson.hs:215-224)."""

    name: str
    arrival_rate: float  # λ
    utilisation: float  # ρ = λ/μ
    mean_customers: float  # ρ/(1-ρ)
    response_time: float  # 1/(μ-λ)


def arrival_rates(chain: list[OperatorSpec], source_rate: float) -> np.ndarray:
    """λ = (I − Pᵀ)⁻¹ a for a linear chain (Jackson.hs:104-111).

    P[i][j] is the traffic fraction from operator i to j; for a chain,
    P[i][i+1] = selectivity_i. The linear solve is kept (rather than a
    running product) so branching graphs (merge/join) can reuse it.
    """
    n = len(chain)
    P = np.zeros((n, n))
    for i in range(n - 1):
        P[i][i + 1] = chain[i].selectivity
    a = np.zeros(n)
    a[0] = source_rate
    return np.linalg.solve(np.eye(n) - P.T, a)


def analyse(chain: list[OperatorSpec], source_rate: float) -> list[OperatorInfo]:
    lam = arrival_rates(chain, source_rate)
    out = []
    for spec, l in zip(chain, lam):
        mu = spec.service_rate
        rho = 0.0 if np.isinf(mu) else l / mu
        mean_c = rho / (1 - rho) if rho < 1 else float("inf")
        resp = 1 / (mu - l) if mu > l else float("inf")
        out.append(OperatorInfo(spec.name, float(l), float(rho), mean_c, resp))
    return out


def is_over_utilised(infos: list[OperatorInfo]) -> bool:
    """ρ > 1 anywhere → the pipeline cannot keep up (Jackson.hs:346-347)."""
    return any(i.utilisation > 1 for i in infos)


def partition_utilisation(
    infos: list[OperatorInfo], partitions: list[list[int]]
) -> list[float]:
    """Summed utilisation per partition; viable if each ≤ maxNodeUtil
    (Orchestration viability, CompileIoT.hs:118). On Spark 'partition'
    reads as 'executor-core budget per stage'."""
    return [sum(infos[i].utilisation for i in part) for part in partitions]


def egress_bandwidth(
    infos: list[OperatorInfo], event_bytes: float, at: int
) -> float:
    """Departure bytes/s after operator ``at``, with per-event TCP/IP
    weighting (Bandwidth.hs:99-122,166-168)."""
    lam_out = infos[at].arrival_rate * (
        1.0 if at + 1 >= len(infos) else infos[at + 1].arrival_rate / max(infos[at].arrival_rate, 1e-300)
    )
    return lam_out * (event_bytes + TCP_OVERHEAD_BYTES)
