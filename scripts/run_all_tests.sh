#!/usr/bin/env bash
# Full test suite, including the opt-in tiers that the default
# `pytest tests/` run excludes (pytest.ini addopts):
#   - slow: cross-framework torch learning-parity (tests/test_cross_framework.py)
#   - tpu:  real-TPU-only checks auto-skip on the CPU test platform; run
#           scripts/check_dropout_tpu.py / the verify recipe for those.
# Then the automated AUPR regression gates (scripts/aupr_gate_check.py)
# on the real TPU: a short 1-seed x 10-fold protocol whose per-fold
# test-AUPR distribution must stay inside the stored short band, plus
# the FULL 18k-iteration protocol on a held-out seed gated against the
# results/Gdataset_full_v2 band (VERDICT r4 #7).
# Intended as the nightly / pre-release target (VERDICT r1 #10, r2 #6).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -m "" "$@"
python scripts/aupr_gate_check.py
python scripts/aupr_gate_check.py --full-band
