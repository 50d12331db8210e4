"""canary_verdict gate-floor logic (VERDICT r15 #3 + ADVICE r15):
the LAST_DIRECT_HEALTHY clamp must apply ONLY when both the scale
factor and the transform-code identity match the measurement — a
stale floor (code changed since it was measured) or a wrong-scale
caller must get the unclamped estimate with the staleness flagged.
Pure-Python: no Spark session."""

from __future__ import annotations

import os
import sys

# repo root from __file__, not a hardcoded path (ADVICE r16): the
# suite must run from any checkout location, like test_oracle_types.py
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def _canary(gflops: float, mops: float) -> dict:
    return {"end": {"gflops_1t": gflops, "py_mops": mops}}


def _healthy_end() -> dict:
    band = bench.HEALTHY_BAND
    return _canary(
        sum(band["gflops_1t"]) / 2, sum(band["py_mops"]) / 2
    )


def test_floor_applies_when_sf_and_hash_match(monkeypatch):
    monkeypatch.setitem(
        bench.LAST_DIRECT_HEALTHY, "code_hash", bench.transform_code_hash()
    )
    sf = bench.LAST_DIRECT_HEALTHY["sf"]
    floor = bench.LAST_DIRECT_HEALTHY["transform_sec"]
    # healthy ratio=1.0, measured transform faster than the floor:
    # the clamp lifts the estimate to the floor
    out = bench.canary_verdict(_healthy_end(), floor / 2, sf)
    assert out["gate_floor_stale"] is False
    assert out["gate_estimate_healthy_sec"] == floor
    assert out["gate_estimate_unclamped_sec"] < floor


def test_floor_stale_when_code_hash_differs(monkeypatch):
    monkeypatch.setitem(
        bench.LAST_DIRECT_HEALTHY, "code_hash", "0" * 12
    )
    sf = bench.LAST_DIRECT_HEALTHY["sf"]
    floor = bench.LAST_DIRECT_HEALTHY["transform_sec"]
    out = bench.canary_verdict(_healthy_end(), floor / 2, sf)
    assert out["gate_floor_stale"] is True
    # unclamped estimate stands — the floor measured DIFFERENT code
    assert out["gate_estimate_healthy_sec"] == round(floor / 2, 3)


def test_floor_skipped_at_other_sf_and_missing_sf(monkeypatch):
    monkeypatch.setitem(
        bench.LAST_DIRECT_HEALTHY, "code_hash", bench.transform_code_hash()
    )
    floor = bench.LAST_DIRECT_HEALTHY["transform_sec"]
    # ADVICE r15: a caller at another scale (or omitting sf) must not
    # inherit the sf0.1 clamp
    for sf in (0.01, None):
        out = bench.canary_verdict(_healthy_end(), floor / 2, sf)
        assert out["gate_estimate_healthy_sec"] == round(floor / 2, 3)


def test_current_code_hash_is_recorded():
    # the shipped constant must carry the hash of the CURRENT tree —
    # refreshing the floor without re-pinning identity re-opens the
    # silent-staleness hole this mechanism closes
    assert (
        bench.LAST_DIRECT_HEALTHY["code_hash"]
        == bench.transform_code_hash()
    )
