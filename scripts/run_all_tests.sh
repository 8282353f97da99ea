#!/usr/bin/env bash
# Full test suite, including the opt-in tiers that the default
# `pytest tests/` run excludes (pytest.ini addopts):
#   - slow: cross-framework torch learning-parity (tests/test_cross_framework.py)
#   - tpu:  real-TPU-only checks auto-skip on the CPU test platform; run
#           scripts/check_dropout_tpu.py / the verify recipe for those.
# Intended as the nightly / pre-release target (VERDICT r1 #10).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -m "" "$@"
