"""The per-fold AUPR regression gate must separate a real regression
from basin-hopping (round-1 VERDICT weak #6)."""

import json
import os

import numpy as np
import pytest

from dream_gnn_tpu.eval.aupr_gate import (collect_fold_auprs,
                                          distribution_summary, gate)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mixture(rng, n, lo_w, lo_c=0.18, hi_c=0.43, sd=0.02):
    basins = rng.random(n) < lo_w
    return np.where(basins, rng.normal(lo_c, sd, n),
                    rng.normal(hi_c, sd, n))


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(0)
    return distribution_summary(_mixture(rng, 200, lo_w=0.7))


def test_same_distribution_passes(ref):
    rng = np.random.default_rng(1)
    ok, report = gate(_mixture(rng, 100, lo_w=0.7), ref)
    assert ok, report


def test_basin_hop_passes(ref):
    """Mixture weight swings (0.7 -> 0.2 low-basin) are fold-split
    luck, not regressions."""
    rng = np.random.default_rng(2)
    ok, report = gate(_mixture(rng, 100, lo_w=0.2), ref)
    assert ok, report
    ok, report = gate(_mixture(rng, 100, lo_w=0.95), ref)
    assert ok, report


def test_whole_run_in_one_basin_passes(ref):
    rng = np.random.default_rng(3)
    ok, report = gate(rng.normal(0.43, 0.02, 100), ref)
    assert ok, report


def test_center_shift_fails(ref):
    """Both basins down 0.08 — a real regression — must fail."""
    rng = np.random.default_rng(4)
    ok, report = gate(_mixture(rng, 100, lo_w=0.7, lo_c=0.10, hi_c=0.35),
                      ref)
    assert not ok, report


def test_collapse_to_zero_fails(ref):
    rng = np.random.default_rng(5)
    ok, report = gate(np.abs(rng.normal(0.02, 0.01, 100)), ref)
    assert not ok, report


def test_improvement_passes(ref):
    """Centers moving UP is an improvement, not a regression."""
    rng = np.random.default_rng(6)
    ok, report = gate(_mixture(rng, 100, lo_w=0.5, lo_c=0.22, hi_c=0.47),
                      ref)
    assert ok, report


@pytest.mark.parametrize("preset", ["Gdataset", "Cdataset", "lrssl"])
def test_canonical_artifacts_self_consistent(preset):
    """The shipped v2 protocol artifacts gate-pass against their own
    stored summaries (and the artifact files parse)."""
    d = os.path.join(REPO, "results", f"{preset}_full_v2")
    with open(os.path.join(d, "aupr_distribution.json")) as f:
        stored = json.load(f)
    auprs = collect_fold_auprs(d)
    assert auprs.size == stored["n"] == 100
    ok, report = gate(auprs, stored)
    assert ok, report
